package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity: small groups flagged, level = min group size, " +
    "risky totals exact") {
    val rows = Seq.fill(6)((1, "A")) ++ Seq.fill(2)((1, "B")) ++
      Seq.fill(1)((2, "A"))
    val df = rows.toDF("nation", "seg")
    val got = Privacy.kAnonymity(df, Seq(col("nation"), col("seg")),
      Seq("nation", "seg"), k = 5).collect()
    val byKey = got.map(r => (r.getInt(0), r.getString(1)) -> r).toMap
    assert(!byKey((1, "A")).getAs[Boolean]("risky"))
    assert(byKey((1, "B")).getAs[Boolean]("risky"))
    assert(byKey((2, "A")).getAs[Boolean]("risky"))
    got.foreach { r =>
      assert(r.getAs[Long]("k_anonymity") == 1L)
      assert(r.getAs[Long]("n_risky_groups") == 2L)
      assert(r.getAs[Long]("n_risky_rows") == 3L)
    }
  }

  test("kAnonymity: a fully generalized table is never risky; " +
    "layout-independent") {
    val df = (0 until 30).map(i => (i % 2, "X")).toDF("nation", "seg")
    val a = Privacy.kAnonymity(df, Seq(col("nation"), col("seg")),
      Seq("nation", "seg"), k = 5).collect()
    assert(a.forall(!_.getAs[Boolean]("risky")))
    assert(a.head.getAs[Long]("k_anonymity") == 15L)
    val b = Privacy.kAnonymity(df.repartition(7),
      Seq(col("nation"), col("seg")), Seq("nation", "seg"), k = 5)
      .collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
