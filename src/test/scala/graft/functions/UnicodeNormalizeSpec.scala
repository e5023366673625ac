package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("NFC composes decomposed sequences; composed and ASCII pass " +
    "through unchanged; nulls stay null") {
    val df = Seq(
      (1L, "cafe\u0301"), // decomposed: e + combining acute
      (2L, "caf\u00e9"), // already composed
      (3L, "plain ascii"),
      (4L, null)
    ).toDF("id", "s")
    val got = df.select($"id",
        TextFunctions.unicodeNormalize($"s").as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("caf\u00e9"))
    assert(got(2L).contains("caf\u00e9"))
    assert(got(3L).contains("plain ascii"))
    assert(got(4L).isEmpty)
  }

  test("NFKC folds compatibility characters (ligatures, fullwidth)") {
    val df = Seq((1L, "\ufb01le"), (2L, "\uff21BC")).toDF("id", "s")
    val got = df.select($"id",
        TextFunctions.unicodeNormalize($"s", "NFKC").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "file") // fi ligature -> f + i
    assert(got(2L) == "ABC") // fullwidth A -> A
    // ...but NFC leaves compatibility characters alone
    val nfc = df.select(TextFunctions.unicodeNormalize($"s", "NFC"))
      .collect().map(_.getString(0)).toSet
    assert(nfc == Set("\ufb01le", "\uff21BC"))
  }

  test("registered SQL function agrees with the Column API") {
    graft.plans.GraftExtensions.registerAll(spark)
    // the Scala literal embeds the combining mark into the SQL text
    val got = spark.sql(
      "SELECT graft_unicode_normalize('cafe\u0301', 'NFC') AS n")
      .head().getString(0)
    assert(got == "caf\u00e9")
  }

  test("invalid form is rejected at construction") {
    intercept[IllegalArgumentException] {
      TextFunctions.unicodeNormalize(lit("x"), "NFX")
    }
  }
}
