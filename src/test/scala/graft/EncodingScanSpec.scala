package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Encoding-quality signals (x120). The driver corpus is clean — every
  * count zero — so the oracle match alone proves nothing about
  * DETECTION; these fixtures plant each defect class and pin the
  * counts. */
class EncodingScanSpec extends SparkSpec {

  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("replacement chars counted") {
    val df = one("bad � decode �� here")
      .select(TextFunctions.replacementCount(col("text")).as("n"))
    assert(df.head.getLong(0) == 3L)
  }

  test("control chars counted; tab/newline/CR exempt") {
    val df = one("a\u0000b c\td\ne\rf\u0007g\u007f")
      .select(TextFunctions.ctrlCount(col("text")).as("n"))
    assert(df.head.getLong(0) == 3L) // NUL, BEL, DEL — not \t\n\r
  }

  test("mojibake digraphs counted") {
    // "café" and a smart quote after a cp1252 round-trip:
    // é → Ã©, ’ → â€™ (the â€ prefix is the counted signature)
    val df = one("cafÃ© said â€™hello")
      .select(TextFunctions.mojibakeCount(col("text")).as("n"))
    assert(df.head.getLong(0) == 2L)
  }

  test("ascii ratio: printable fraction, rounded; NULL on empty") {
    val r = one("abcdé") // 4 printable of 5 chars
      .select(TextFunctions.asciiPrintableRatio(col("text"))).head.getDouble(0)
    assert(r == 0.8)
    assert(one("").select(TextFunctions.asciiPrintableRatio(col("text")))
      .head.isNullAt(0))
  }

  test("clean text: zero counts, ratio 1.0") {
    val row = one("A clean sentence, nothing else.")
      .select(TextFunctions.replacementCount(col("text")),
        TextFunctions.ctrlCount(col("text")),
        TextFunctions.mojibakeCount(col("text")),
        TextFunctions.asciiPrintableRatio(col("text"))).head
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L && row.getLong(2) == 0L)
    assert(row.getDouble(3) == 1.0)
  }
}
