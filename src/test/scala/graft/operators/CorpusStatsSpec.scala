package graft.operators

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("vocabTopK ranks by freq desc then term asc, k-bounded") {
    val docs = Seq("b a a", "c b A", "").toDF("text")
    val top = CorpusStats.vocabTopK(docs, "text", k = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // lowercased: a=3, b=2, c=1
    assert(top.toSeq == Seq((1, "a", 3L), (2, "b", 2L), (3, "c", 1L)))
    assert(CorpusStats.vocabTopK(docs, "text", k = 2).count() == 2)
  }

  test("compositionReport counts docs, chars, tokens and quality passes") {
    val docs = Seq(
      ("web", "en", "the and of to in is a that " * 20), // high quality
      ("web", "en", ";;;"),                              // punct soup
      ("web", "de", "der die und")).toDF("source", "lang", "text")
    val m = CorpusStats.compositionReport(docs, Seq("source", "lang"), "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val enText = "the and of to in is a that " * 20
    assert(m(("web", "en")) ==
      ((2L, enText.length + 3L, 160L + 1L, 1L)))
    assert(m(("web", "de")) == ((1L, 11L, 3L, 1L)))
  }

  test("bigramNovelty separates shared from solo bigrams") {
    val docs = Seq(
      (1L, "x y z"),      // bigrams: "x y", "y z"
      (2L, "x y w"),      // bigrams: "x y" (shared), "y w" (solo)
      (3L, "solo"),       // no bigrams
      (4L, "")).toDF("doc_id", "text")
    val m = CorpusStats.bigramNovelty(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(m(1L) == ((2L, 2L, 1L, 0.5)))
    assert(m(2L) == ((2L, 2L, 1L, 0.5)))
    assert(m(3L) == ((0L, 0L, 0L, 0.0)))
    assert(m(4L) == ((0L, 0L, 0L, 0.0)))
  }

  test("bigramNovelty counts within-doc repeats once, as non-solo only if shared") {
    // "r s r s": bigrams r-s (x2), s-r — distinct {r s, s r}, none shared
    val m = CorpusStats.bigramNovelty(
      Seq((1L, "r s r s")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L) == ((3L, 2L, 2L)))
  }

  test("oovStats measures coverage against the top-k vocab") {
    val docs = Seq((1L, "a A b"), (2L, "b c"), (3L, "")).toDF("doc_id", "text")
    // counts: a=2, b=2, c=1 -> top-2 vocab = {a, b}
    val m = CorpusStats.oovStats(docs, "doc_id", "text", vocabK = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m(1L) == ((3L, 3L, 0.0)))
    assert(m(2L) == ((2L, 1L, 0.5)))
    assert(m(3L) == ((0L, 0L, 0.0)))
  }

  test("lengthQuantiles interpolates like quantile_cont") {
    val df = Seq(("en", 10), ("en", 20), ("en", 30), ("en", 40), ("de", 7))
      .toDF("lang", "n_chars")
    val m = CorpusStats.lengthQuantiles(df, "lang", "n_chars").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // n=4: p25 rank 0.75 → 10 + 0.75*10 = 17.5; p50 → 25; p75 → 32.5
    assert(m("en") == ((4L, 10L, 40L, 17.5, 25.0, 32.5)))
    assert(m("de") == ((1L, 7L, 7L, 7.0, 7.0, 7.0)))
  }
}
