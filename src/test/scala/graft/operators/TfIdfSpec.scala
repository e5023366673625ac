package graft.operators

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("top terms rank by tf·N/df with term-order tie break") {
    val docs = Seq(
      (1L, "apple apple banana shared"),
      (2L, "banana cherry shared shared"),
      (3L, "cherry date shared")
    ).toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rn")
      .select("doc_id", "term", "tf", "score", "rn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    // doc 1: apple tf=2 df=1 → 2·3/1 = 6; banana tf=1 df=2 → 1.5
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, "apple", 2L, 6.0, 1), (1L, "banana", 1L, 1.5, 2)))
    // doc 2: shared tf=2 df=3 → 2; banana tf=1 df=2 → 1.5 (beats cherry
    // 1.5 by term order tie-break: 'banana' < 'cherry')
    assert(got.filter(_._1 == 2L).toSeq == Seq(
      (2L, "shared", 2L, 2.0, 1), (2L, "banana", 1L, 1.5, 2)))
    // doc 3: date tf=1 df=1 → 3; cherry tf=1 df=2 → 1.5
    assert(got.filter(_._1 == 3L).toSeq == Seq(
      (3L, "date", 1L, 3.0, 1), (3L, "cherry", 1L, 1.5, 2)))
  }

  test("bm25: rare term beats common term; length normalization; no-match docs absent") {
    val docs = Seq(
      (1L, "rare common common common common common"),
      (2L, "common common common common common common"),
      (3L, "rare rare other words here now"),
      (4L, "nothing matches in this document at all"),
      (5L, "common")
    ).toDF("doc_id", "text")
    val got = TfIdf.bm25TopK(docs, "doc_id", "text",
        Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // doc 4 contains neither term — not returned
    assert(!got.exists(_._1 == 4L))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 5L))
    // rare (df=2) carries higher idf than common (df=3): doc 3 with
    // tf(rare)=2 must outrank doc 2 with tf(common)=6 — BM25's tf
    // saturation + idf is the whole point vs raw counts
    val rank = got.map(t => t._1 -> t._3).toMap
    assert(rank(3L) < rank(2L), s"got $got")
    // ranks are dense 1..n in score order
    assert(got.sortBy(_._3).map(_._3).toSeq == (1 to 4).toSeq)
    val byRank = got.sortBy(_._3).map(_._2)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("bm25: empty corpus rejected, duplicate terms rejected") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TfIdf.bm25TopK(docs.filter($"doc_id" < 0), "doc_id", "text", Seq("a"))
    }
    intercept[IllegalArgumentException] {
      TfIdf.bm25TopK(docs, "doc_id", "text", Seq("a", "a"))
    }
  }
}
