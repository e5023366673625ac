package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val clean = Seq(
    // (id, block, name, bal, seg)
    (1L, 1, "Customer#000000001", 100.0, "AUTO"),
    (2L, 1, "Customer#000000002", 500.0, "AUTO"),
    (3L, 1, "Customer#000000003", 900.0, "RAIL"),
    (4L, 2, "Customer#000000004", 100.0, "AUTO"))

  test("a typo'd near-duplicate inside the window is matched; " +
    "a same-name record in ANOTHER block is not") {
    val rows = clean ++ Seq(
      (-1L, 1, "Customer#00000000x", 101.0, "AUTO"), // dirty twin of 1
      (-4L, 3, "Customer#000000004", 100.0, "AUTO")) // wrong block
    val got = EntityResolution.sortedNeighborhood(
        rows.toDF("id", "blk", "nm", "bal", "seg"),
        "id", "blk", "nm", "bal", "seg")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((-1L, 1L)))
    assert(!got.exists(p => p._1 == -4L || p._2 == -4L))
  }

  test("score components: name similarity alone (2.0 + 0.5) does NOT " +
    "clear the threshold; adding balance agreement does") {
    val rows = Seq(
      (1L, 1, "alpha records", 100.0, "AUTO"),
      (2L, 1, "alpha recordz", 900.0, "AUTO"), // name+seg only: 2.5
      (3L, 1, "alpha recordx", 101.0, "AUTO")) // name+bal+seg vs 1: 4.0
    val got = EntityResolution.sortedNeighborhood(
        rows.toDF("id", "blk", "nm", "bal", "seg"),
        "id", "blk", "nm", "bal", "seg")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[Double]("score"))).toMap
    // (1,2) and (2,3) are lev-1 name matches but the balances are far
    // apart → 2.5 < 3.0, filtered; only (1,3) agrees on name AND bal
    assert(got.keySet == Set((1L, 3L)))
    assert(got((1L, 3L)) == 4.0)
  }

  test("candidate count is bounded by n·window, never all-pairs") {
    val n = 200
    val rows = (1 to n).map(i =>
      (i.toLong, 1, f"name$i%05d", i * 10.0, "SEG"))
    val cand = EntityResolution.sortedNeighborhood(
      rows.toDF("id", "blk", "nm", "bal", "seg"),
      "id", "blk", "nm", "bal", "seg",
      window = 3, minScore = 0.0) // keep every candidate
    assert(cand.count() <= n * 3L)
  }

  test("layout independence: repartitioned input, identical matches") {
    val rows = clean ++ Seq((-1L, 1, "Customer#00000000x", 101.0, "AUTO"))
    val df = rows.toDF("id", "blk", "nm", "bal", "seg")
    val a = EntityResolution.sortedNeighborhood(df,
      "id", "blk", "nm", "bal", "seg").collect().map(_.toSeq).toSeq
    val b = EntityResolution.sortedNeighborhood(df.repartition(7),
      "id", "blk", "nm", "bal", "seg").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
