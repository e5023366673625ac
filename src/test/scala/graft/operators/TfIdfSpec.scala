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

  test("queryScoreTopK: score is tf * N/df exactly, absent term scores 0") {
    val docs = Seq(
      (1L, "spark spark merge"),  // tf(spark)=2, tf(merge)=1
      (2L, "spark other words"),  // tf(spark)=1
      (3L, "nothing relevant"),
      (4L, "merge merge merge")). // tf(merge)=3
      toDF("doc_id", "text")
    // N=4, df(spark)=2, df(merge)=2, df(absent)=0
    val got = TfIdf.queryScoreTopK(docs, "doc_id", "text",
      Seq("spark", "merge", "absent"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 2 * 2.0 + 1 * 2.0) // 6.0
    assert(got(2L) == 2.0)
    assert(got(4L) == 6.0)
    assert(!got.contains(3L), "doc matching no term is absent")
  }

  test("rrfFusion: reciprocal-rank sum, one-sided rows count once") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rn")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("doc_id", "rn")
    val got = TfIdf.rrfFusion(a, b, "doc_id", k = 4, c = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getInt(4)))
    def rr(r: Int) = 1.0 / (60 + r)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = Map(
      10L -> r6(rr(1) + rr(2)), 20L -> r6(rr(2) + rr(1)),
      30L -> r6(rr(3)), 40L -> r6(rr(3)))
    got.foreach { case (id, rrf, _) => assert(rrf == expect(id), s"id=$id") }
    // 10 and 20 tie on the fused score → id breaks the tie
    assert(got.sortBy(_._3).map(_._1).toSeq == Seq(10L, 20L, 30L, 40L))
  }

  test("rboCurve: identical rankings score the full truncated mass") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rn")
    val got = TfIdf.rboCurve(a, a, "doc_id", depth = 3).collect()
    assert(got.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1, 1L, 1.0), (2, 2L, 1.0), (3, 3L, 1.0)))
    // rbo = 0.1·(1 + 0.9 + 0.81), rounded at 6 dp
    val expect = math.floor(0.1 * (1.0 + 0.9 + 0.9 * 0.9) * 1e6 + 0.5) / 1e6
    assert(got.forall(_.getDouble(3) == expect))
  }

  test("rboCurve: disjoint rankings score zero; top-heavy beats tail") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rn")
    val b = Seq((7L, 1), (8L, 2), (9L, 3)).toDF("doc_id", "rn")
    val dis = TfIdf.rboCurve(a, b, "doc_id", depth = 3).collect()
    assert(dis.forall(r => r.getLong(1) == 0L && r.getDouble(3) == 0.0))
    // sharing the TOP item outweighs sharing the BOTTOM one
    val topShare = TfIdf.rboCurve(a,
      Seq((1L, 1), (8L, 2), (9L, 3)).toDF("doc_id", "rn"), "doc_id", 3)
      .head().getDouble(3)
    val tailShare = TfIdf.rboCurve(a,
      Seq((7L, 1), (8L, 2), (3L, 3)).toDF("doc_id", "rn"), "doc_id", 3)
      .head().getDouble(3)
    assert(topShare > tailShare, s"top=$topShare tail=$tailShare")
  }

  test("cosinePairs: near-identical docs pair at ~1; threshold filters; " +
    "stopword-only overlap is never a candidate") {
    val docs = Seq(
      (1L, "alpha beta gamma delta the the"),
      (2L, "alpha beta gamma delta the the"), // exact copy of 1
      (3L, "alpha beta gamma epsilon the the"), // near 1/2
      (4L, "zeta eta theta iota the the"), // shares only 'the' with 1-3
      (5L, "kappa lambda mu nu xi omicron")
    ).toDF("doc_id", "text")
    // df('the') = 4 > maxDf=3 → 'the' generates no candidates
    val got = TfIdf.cosinePairs(docs, "doc_id", "text",
        minCosineBp = 50, maxDf = 3)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // the exact copy pair scores 1.0
    assert(got((1L, 2L)) == 1.0, s"got $got")
    // near pair present and high but below the copy
    assert(got.contains(1L -> 3L) && got((1L, 3L)) < 1.0)
    // doc 4 shares ONLY the stopword with 1-3: never a candidate even
    // though the dot product over 'the' is positive
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L })
    // doc 5 shares nothing
    assert(!got.keys.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("cosinePairs: full dot includes high-df terms once a rare term " +
    "makes the pair a candidate") {
    // docs 1,2 share rare 'needle' (candidate) AND common 'filler'
    // (df=3 > maxDf=2, excluded from candidates but NOT from the dot)
    val docs = Seq(
      (1L, "needle filler filler filler"),
      (2L, "needle filler filler filler"),
      (3L, "filler other words")
    ).toDF("doc_id", "text")
    val got = TfIdf.cosinePairs(docs, "doc_id", "text",
      minCosineBp = 50, maxDf = 2).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    // identical weight vectors → cosine exactly 1.0; n_shared counts
    // BOTH terms (the gather is over all shared terms, not just rare)
    assert(r.getLong(2) == 2L, s"n_shared=${r.getLong(2)}")
    assert(r.getDouble(3) == 1.0)
  }

  test("queryLikelihoodTopK: doc with the term outranks doc without; " +
    "longer doc with same tf ranks lower; absent-everywhere term drops") {
    val docs = Seq(
      (1L, "spark spark engine"),
      (2L, "spark engine engine engine engine engine engine"),
      (3L, "pure noise tokens here")).toDF("doc_id", "text")
    val got = TfIdf.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq("spark", "unseenword"), k = 3, mu = 10.0)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got(1L) == 1, "highest tf/length wins")
    assert(got(2L) == 2, "same term diluted by length ranks second")
    assert(got(3L) == 3, "smoothing still scores the no-match doc")
    intercept[IllegalArgumentException] {
      TfIdf.queryLikelihoodTopK(docs, "doc_id", "text",
        Seq("unseenword"), k = 3)
    }
  }
}
