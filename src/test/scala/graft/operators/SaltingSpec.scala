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
}
