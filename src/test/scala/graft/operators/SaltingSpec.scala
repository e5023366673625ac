package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // skewed: key "hot" has 10k rows, others a handful
  private lazy val skewed = (Seq.fill(10000)("hot") ++ Seq("a", "b", "c"))
    .zipWithIndex.map { case (k, i) => (k, i.toLong, i * 0.5) }
    .toDF("k", "id", "v")

  test("saltedAgg equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("v_sum"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
      .map { case (k, s, n) => k -> (s, n) }.toMap
    val salted = Salting.saltedAgg(skewed, Seq("k"), salts = 8,
      saltFrom = Seq($"id"),
      partialAggs = Seq(sum("v").as("v_sum"), count(lit(1)).as("n")),
      finalAggs = Seq(sum("v_sum").as("v_sum"), sum("n").as("n")))
      .as[(String, Double, Long)].collect()
    assert(salted.length == 4)
    salted.foreach { case (k, s, n) =>
      val (ps, pn) = plain(k)
      assert(math.abs(s - ps) < 1e-6 && n == pn)
    }
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).count()
    val salted = Salting.saltedJoin(skewed, dim, Seq("k"), salts = 8,
      bigSaltFrom = Seq($"id"))
    assert(salted.count() == plain)
    // spot-check a row keeps its label
    assert(salted.filter($"k" === "a").select("label").as[String].head() == "A")
  }

  test("skewReport: planted heavy key drives skew, salt, and share") {
    // keys: "hot" ×90, ten cold keys ×1 → 11 keys, 100 rows,
    // mean 100/11, skew = 90/(100/11) = 9.9, salt = ceil(9.9) = 10
    val rows = (Seq.fill(90)("hot") ++ (0 until 10).map(i => s"c$i"))
      .toDF("k")
    val got = Salting.skewReport(rows, "k", k = 3).collect()
    assert(got.length == 3)
    val hot = got.find(_.getString(0) == "hot").get
    assert(hot.getLong(1) == 90L)
    assert(hot.getDouble(2) == 0.9, "share of all rows")
    assert(got.forall(_.getDouble(3) == 9.9), "skew = max/mean")
    assert(got.forall(_.getLong(4) == 10L), "salt levels the hot key")
    // the two cold survivors are the alphabetically-first tie-break picks
    assert(got.map(_.getString(0)).sorted.toSeq == Seq("c0", "c1", "hot"))
  }

  test("skewReport: uniform keys report skew 1, salt 1") {
    val rows = (0 until 40).map(i => s"k${i % 8}").toDF("k")
    val got = Salting.skewReport(rows, "k", k = 8).collect()
    assert(got.forall(_.getDouble(3) == 1.0))
    assert(got.forall(_.getLong(4) == 1L))
    assert(got.forall(_.getLong(1) == 5L))
  }

  test("saltedTopK equals the plain one-window top-k under planted " +
    "skew, with dense ranks and tie determinism") {
    import spark.implicits._
    // hot group: 10k rows in 'big', 20 in 'small'; scores collide a lot
    val rows = (0L until 10000L).map(i => ("big", i, (i % 97).toDouble)) ++
      (0L until 20L).map(i => ("small", 100000L + i, (i % 7).toDouble))
    val df = rows.toDF("grp", "id", "score")
    val got = Salting.saltedTopK(df, "grp", "id", "score", k = 5)
      .collect()
      .map(r => (r.getString(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("score").desc, col("id").asc)
    val expect = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).collect()
      .map(r => (r.getString(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == expect.toSeq)
    assert(got.count(_._1 == "big") == 5 && got.count(_._1 == "small") == 5)
  }
}
