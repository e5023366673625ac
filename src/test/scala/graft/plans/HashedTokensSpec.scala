package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Hash-for-hash parity of the codegen'd [[HashedTokens]] with the
  * Column composition it replaces — pinned on the hostile-input
  * classes the edge corpus plants (the md5-60 values feed oracle-
  * checked n-gram counts, so one divergent token breaks x88/x182). */
class HashedTokensSpec extends SparkSpec {
  import spark.implicits._

  private val inputs = Seq(
    "plain ascii words",
    "MiXeD CaSe AND UPPER",
    "  leading and trailing spaces  ",
    "\ttab-leading keeps the empty split token",
    "internal\t\ttabs\nand\nnewlines collapse per regex",
    "", "   ", "\t", "single",
    "unicode: Σίσυφος STRASSE straße İstanbul",
    "digits 123 and punct-u_ation!",
    "a  b   c    d", // multi-space runs
    "ends with tab\t")

  test("codegen expression equals transform(tokens(lower), md5Hash60) " +
    "element-for-element, null-for-null") {
    val df = (inputs.map(Option(_)) :+ None).toDF("text")
    val rows = df.select(
        TextFunctions.hashedTokens(col("text")).as("fast"),
        transform(TextFunctions.tokens(lower(col("text"))),
          t => TextFunctions.md5Hash60(t)).as("ref"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val fast = if (r.isNullAt(0)) null else r.getSeq[Long](0)
      val ref = if (r.isNullAt(1)) null else r.getSeq[Long](1)
      assert(fast == ref, s"input #$i: $fast vs $ref")
    }
  }

  test("parity over the real documents table (every doc, exact)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs.select(
        TextFunctions.hashedTokens(col("text")).as("fast"),
        transform(TextFunctions.tokens(lower(col("text"))),
          t => TextFunctions.md5Hash60(t)).as("ref"))
      .filter(not(col("fast") <=> col("ref")))
      .count()
    assert(bad == 0, s"$bad documents diverge")
  }
}
