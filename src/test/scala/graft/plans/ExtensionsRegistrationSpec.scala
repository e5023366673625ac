package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions must be reachable from plain SQL through the
  * SparkSessionExtensions hook (c-tier extension wiring, SURVEY §7.3). */
class ExtensionsRegistrationSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // getOrCreate may return the suite-shared session (extensions only
    // apply to a NEW session) — register into it directly in that case.
    GraftExtensions.registerAll(s)
    s
  }

  test("graft_* functions callable from spark.sql") {
    val r = spark.sql(
      """SELECT
        |  graft_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  graft_sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS jac,
        |  graft_sorted_intersect_count(array(1L, 2L), array(2L, 9L)) AS ic,
        |  graft_ngrams_long('abab', 3) AS grams
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 0.5)
    assert(r.getLong(2) == 1L)
    // "abab" → grams "aba","bab" → 2 distinct packed longs, sorted
    val grams = r.getSeq[Long](3)
    assert(grams.length == 2 && grams == grams.sorted)
  }

  test("graft_cdc_boundaries callable from SQL: end always a boundary, " +
    "short strings are one chunk") {
    val r = spark.sql(
      """SELECT graft_cdc_boundaries('tiny', 8, 63) AS short,
        |       graft_cdc_boundaries(repeat('abcdefgh', 40), 8, 63) AS long
        |""".stripMargin).head()
    assert(r.getSeq[Long](0) == Seq(4L))
    val bs = r.getSeq[Long](1)
    assert(bs.last == 320L, "document end is always a boundary")
    assert(bs == bs.sorted && bs.distinct == bs)
  }

  test("codegen and interpreted paths agree") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = spark.sql(
      "SELECT graft_sorted_jaccard(graft_ngrams_long('hello world', 3), " +
        "graft_ngrams_long('hello walrus', 3)) AS j").head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val on = spark.sql(
      "SELECT graft_sorted_jaccard(graft_ngrams_long('hello world', 3), " +
        "graft_ngrams_long('hello walrus', 3)) AS j").head().getDouble(0)
    assert(off == on)
  }
}
