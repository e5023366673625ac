package graft.operators

import graft.SparkSpec

class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def stats(docs: Seq[(Long, String)], k: Int, maxDupFrac: Double = 0.5) =
    RepeatedSpans.spanStats(docs.toDF("doc_id", "text"), "doc_id", "text",
      k = k, maxDupFrac = maxDupFrac)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap

  test("cross-document repeated span is covered on both sides") {
    val m = stats(Seq(1L -> "p q r s t", 2L -> "z p q r w"), k = 3)
    assert(m(1L) == ((5L, 3L, 0.6, false)))   // [0,2] covered
    assert(m(2L) == ((5L, 3L, 0.6, false)))   // [1,3] covered
  }

  test("within-document repetition covers the full run and merges overlaps") {
    val m = stats(Seq(1L -> "m n o m n o m n o", 2L -> "a b c d e"), k = 3)
    // every 3-gram of doc 1 repeats (the run is periodic) → all 9 tokens
    assert(m(1L) == ((9L, 9L, 1.0, false)))
    assert(m(2L) == ((5L, 0L, 0.0, true)))
  }

  test("disjoint duplicated spans sum without double-counting") {
    val m = stats(Seq(
      1L -> "p q r x1 x2 m n o",
      2L -> "p q r y1 y2 y3 y4",
      3L -> "z1 m n o z2 z3 z4"), k = 3)
    assert(m(1L)._2 == 6L)                    // [0,2] ∪ [5,7]
    assert(m(2L)._2 == 3L)
    assert(m(3L)._2 == 3L)
  }

  test("documents shorter than k and empty documents report zero") {
    val m = stats(Seq(1L -> "a b", 2L -> "", 3L -> "   ", 4L -> "a b c"), k = 3)
    assert(m(1L) == ((2L, 0L, 0.0, true)))
    assert(m(2L) == ((0L, 0L, 0.0, true)))
    assert(m(3L) == ((0L, 0L, 0.0, true)))
    assert(m(4L) == ((3L, 0L, 0.0, true)))    // unique 3-gram, count 1
  }

  test("a long shared span is one merged interval, not k per position") {
    // "a b c d e" shared between docs: with k=3 the 3 overlapping
    // duplicated 3-grams must union to 5 covered tokens, not 9.
    val m = stats(Seq(1L -> "a b c d e u1 u2", 2L -> "v1 a b c d e v2"), k = 3)
    assert(m(1L)._2 == 5L)
    assert(m(2L)._2 == 5L)
  }

  test("spanIslands: separates one-block boilerplate from smeared " +
    "repetition; dup_tok agrees with spanStats; clean docs report 0") {
    val docs = Seq(
      1L -> "a b c x1 x2 x3 a b c",   // two islands of 3 ([0,3) ∪ [6,9))
      2L -> "m m m m m",              // one island covering the run
      3L -> "p q r s t u v w")        // clean
    val df = docs.toDF("doc_id", "text")
    val got = RepeatedSpans.spanIslands(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_islands"), r.getAs[Long]("longest_island"),
          r.getAs[Long]("dup_tok"), r.getAs[Double]("dup_frac")))).toMap
    assert(got(1L) == ((2L, 3L, 6L, 0.6667)))
    assert(got(2L) == ((1L, 5L, 5L, 1.0)))
    assert(got(3L) == ((0L, 0L, 0L, 0.0)))
    // the island decomposition must re-sum to spanStats' union coverage
    val cov = RepeatedSpans.spanStats(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.forall { case (id, (_, _, dup, _)) => cov(id) == dup })
  }
}
