package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpe: merges follow pair frequency with lex tiebreak; greedy application") {
    // 'aaab' x3, 'ab' x2. Round 1: (a,a)=6 beats (a,b)=5 -> 'aa';
    // round 2 over [aa,a,b]x3 + [a,b]x2: (a,b)=5 beats (aa,a)=3 ->
    // 'ab'; round 3 over [aa,ab]x3 + [ab]x2: (aa,ab)=3 -> 'aaab'
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, "text", numMerges = 3)
    assert(merges.map(m => (m.lhs, m.rhs)) ==
      Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    val v = vocab.as[(String, Long)].collect().toMap
    assert(v("aaab") == 1L, "fully merged after 3 merges")
    assert(v("ab") == 1L, "'ab' merged in round 2")
  }

  test("bpe: greedy left-to-right never re-merges the freshly merged symbol") {
    // one word 'aaaa': merge (a,a) applies as [aa, aa], not [aaa, a]
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, "text", numMerges = 1)
    assert(merges.head.lhs == "a" && merges.head.rhs == "a")
    assert(vocab.as[(String, Long)].collect().toMap.apply("aaaa") == 2L)
  }

  test("bpe: early exhaustion stops; encode counts fallback words as one piece") {
    val docs = Seq(
      (1L, "ab ab"),
      (2L, "emoji 😀 word"), // beyond-BMP token -> fallback
      (3L, "")
    ).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, "text", numMerges = 50)
    assert(merges.size < 50, "tiny corpus exhausts the merge budget")
    val got = Bpe.encodeStats(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(3L) == ((0L, 0L)), "empty doc")
    // doc 2: 'emoji' and 'word' encode from the vocab; the emoji is a
    // fallback word (excluded from training) and costs exactly 1 piece
    val (n2, p2) = got(2L)
    assert(n2 == 3L && p2 >= 3L)
    val inVocab = vocab.as[(String, Long)].collect().toMap
    assert(!inVocab.contains("😀"), "fallback word not trained")
  }

  test("bpe: training is layout-independent") {
    val docs = (1L to 30L).map(i => (i, s"alpha beta gamma tok$i"))
      .toDF("doc_id", "text")
    val (m1, _) = Bpe.train(docs, "text", 5)
    val (m2, _) = Bpe.train(docs.repartition(7), "text", 5)
    assert(m1 == m2)
  }

  test("bpe batched == sequential on a conflict-free corpus") {
    // isolated two-char words: each merge consumes a disjoint symbol
    // pair and produces a length-1 symbol list (no new adjacencies),
    // so the top-3 batch is exactly sequential's first three picks
    val docs = Seq((1L, ("ab " * 10) + ("cd " * 9) + ("ef " * 8)))
      .toDF("doc_id", "text")
    val (seq3, vSeq) = Bpe.train(docs, "text", numMerges = 3)
    val (bat3, vBat) = Bpe.trainBatched(docs, "text", numMerges = 3,
      batchSize = 3)
    assert(seq3 == bat3)
    assert(seq3.map(m => (m.lhs, m.rhs)) ==
      Seq(("a", "b"), ("c", "d"), ("e", "f")))
    assert(vSeq.as[(String, Long)].collect().toMap ==
      vBat.as[(String, Long)].collect().toMap)
  }

  test("bpe batched with batchSize=1 degenerates to sequential exactly") {
    // conflict-FUL corpus (the aaab fixture): per-round top-1 must
    // replay sequential's recount-between-merges behavior
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val (seqM, vSeq) = Bpe.train(docs, "text", numMerges = 3)
    val (batM, vBat) = Bpe.trainBatched(docs, "text", numMerges = 3,
      batchSize = 1)
    assert(seqM == batM)
    assert(vSeq.as[(String, Long)].collect().toMap ==
      vBat.as[(String, Long)].collect().toMap)
  }

  test("bpe batched defers conflicting pairs within a round") {
    // 'aaab'x3 + 'ab'x2: round-1 candidates (a,a)=6 then (a,b)=5 —
    // (a,b) conflicts (claims 'a'), so a batch of 2 accepts (a,a)
    // only, recounts, and merges (a,b) next round; ranks stay dense
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val (m, _) = Bpe.trainBatched(docs, "text", numMerges = 2,
      batchSize = 2)
    assert(m.map(x => (x.rank, x.lhs, x.rhs)) ==
      Seq((1, "a", "a"), (2, "a", "b")))
  }

  test("bpe batched: early exhaustion still stops") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val (m, _) = Bpe.trainBatched(docs, "text", numMerges = 50,
      batchSize = 8)
    assert(m.size < 50)
  }
}
