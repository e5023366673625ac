package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii: urls, emails, phones replaced; order protects url @s") {
    val cases = Seq(
      ("mail me at jane.doe+x@example.co.uk today",
        "mail me at <EMAIL> today"),
      ("see https://example.com/a?b=c@d and move on",
        "see <URL> and move on"),
      ("call +1 (555) 123-4567 now", "call <PHONE> now"),
      ("clean text stays clean", "clean text stays clean"),
      ("two https://a.io links https://b.io here",
        "two <URL> links <URL> here"))
    val got = cases.map(_._1).toDF("text")
      .select(TextFunctions.redactPii($"text")).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("normalizeText: formatting variants collapse to one canonical form") {
    val cases = Seq(
      ("hello   world", "hello world"),
      ("\thello\nworld  ", "hello world"),
      ("hello \u0001world\u007f", "hello world"), // control chars strip
      ("", ""),
      ("   \t\n  ", ""),
      ("already normal", "already normal"))
    val got = cases.map(_._1).toDF("text")
      .select(TextFunctions.normalizeText($"text")).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
    // the dedup property: reformatted copies share a canonical form
    val variants = Seq("a  b\tc", "a b c", "\na b\n\nc\n")
    val canon = variants.toDF("text")
      .select(TextFunctions.normalizeText($"text")).as[String]
      .collect().toSet
    assert(canon == Set("a b c"))
  }

  test("htmlToText: script/style payloads die whole, tags become " +
    "separators, entities decode, whitespace canonicalizes") {
    val html =
      "<html><style>p{x}</style><body><p>Hello &amp; bye</p>" +
        "<script>evil()</script><!-- c --><b>bold</b>text</body></html>"
    val got = Seq(html).toDF("text")
      .select(TextFunctions.htmlToText($"text")).as[String].head()
    // script/style/comment CONTENT is gone; tag boundaries keep words
    // apart; entities decoded
    assert(got == "Hello & bye bold text", s"got [$got]")
  }

  test("htmlToText: &amp; decodes LAST — '&amp;lt;' yields literal " +
    "'&lt;', never '<'") {
    val got = Seq("a &amp;lt; b").toDF("text")
      .select(TextFunctions.htmlToText($"text")).as[String].head()
    assert(got == "a &lt; b", s"got [$got]")
  }

  test("htmlToText: markup-free text only canonicalizes whitespace") {
    val got = Seq("  plain   text ").toDF("text")
      .select(TextFunctions.htmlToText($"text")).as[String].head()
    assert(got == "plain text")
  }

  test("compressRatio: repetitive text compresses far below prose; " +
    "empty text is NULL; deterministic across layouts") {
    val docs = Seq(
      (1L, "the same line repeats " * 50),
      (2L, "Quite varied prose with many distinct words, numbers 12938 " +
        "and punctuation; entropy stays comparatively high here."),
      (3L, "")
    ).toDF("id", "s")
    val got = docs.select($"id",
        TextFunctions.compressRatio($"s").as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).exists(_ < 0.1), s"boilerplate must compress: $got")
    assert(got(2L).exists(_ > 0.5), s"prose must not: $got")
    assert(got(3L).isEmpty)
    val again = docs.repartition(5).select($"id",
        TextFunctions.compressRatio($"s").as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == again)
  }

  test("scriptCounts: per-script character counts over mixed text") {
    val cs = TextFunctions.scriptCounts($"text")
    val row = Seq("ab Привет 你好 12!").toDF("text")
      .select(cs.map { case (n, c) => c.as(n) }: _*).head()
    val got = cs.map(_._1).zipWithIndex
      .map { case (n, i) => n -> row.getLong(i) }.toMap
    assert(got("latin") == 2L, s"$got")
    assert(got("cyrillic") == 6L)
    assert(got("cjk") == 2L)
    assert(got("digit") == 2L)
    assert(got("nonspace") == 13L) // includes the '!'
  }

  test("canonicalizeUrl: tracking params, fragments, default ports " +
    "and trailing slashes all fold to one canonical URL") {
    import spark.implicits._
    val variants = Seq(
      "https://Example.com/Article?utm_source=feed&utm_campaign=x",
      "https://example.com/Article#section2",
      "https://example.com:443/article?fbclid=abc123",
      "https://example.com/article/")
    val got = variants.toDF("u")
      .select(TextFunctions.canonicalizeUrl(org.apache.spark.sql.functions.col("u")))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("https://example.com/article"), got.toString)
    // non-default port and real params survive
    val keep = Seq("http://svc.example.com:8080/v1?q=1&utm_ref=z")
      .toDF("u")
      .select(TextFunctions.canonicalizeUrl(org.apache.spark.sql.functions.col("u")))
      .head().getString(0)
    assert(keep == "http://svc.example.com:8080/v1?q=1")
  }
}
