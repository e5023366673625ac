package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, concat, lit}

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

  test("lengthQuantiles approx path: same schema, rank error within the " +
    "sketch bound") {
    // 10k distinct values per group; accuracy=100 → rank error ε=1%,
    // so each approx quantile's TRUE rank must be within n·ε of target
    val n = 10000
    val df = (1 to n).map(i => ("en", i)).toDF("lang", "n_chars")
    val exact = CorpusStats.lengthQuantiles(df, "lang", "n_chars")
    val approx = CorpusStats.lengthQuantiles(df, "lang", "n_chars",
      approx = true, accuracy = 100)
    assert(approx.schema.map(f => (f.name, f.dataType)) ==
      exact.schema.map(f => (f.name, f.dataType)),
      "approx path must be a drop-in (same schema)")
    val r = approx.collect().head
    val eps = n * (1.0 / 100) // n·ε values of slack on either side
    for ((p, idx) <- Seq(0.25 -> 4, 0.5 -> 5, 0.75 -> 6)) {
      val got = r.getDouble(idx)
      // values are 1..n, so value v has rank v
      assert(math.abs(got - p * n) <= eps + 1,
        s"p$p approx=$got expected within ±$eps of ${p * n}")
    }
    // exact default is unchanged (the oracle-checked path)
    val e = exact.collect().head
    assert(e.getDouble(5) == (n + 1) / 2.0)
  }

  test("unigram bits: common-word docs score low, rare-word docs high") {
    // 'the' dominates the corpus; 'zyx' appears once
    val docs = Seq(
      (1L, "the the the the the the the the"),
      (2L, "zyxqj"),
      (3L, "the the zyxqj the"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = CorpusStats.unigramBits(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.size == 4)
    assert(got(4L) == ((0L, 0.0)), "tokenless doc scores 0")
    // T=13, V=2, tv=15: cnt(the)=11, cnt(zyxqj)=2 (docs 2 AND 3) →
    // p(the)=(11+1)/15, p(zyxqj)=(2+1)/15
    val bThe = -math.log(12.0 / 15) / math.log(2)
    val bZyx = -math.log(3.0 / 15) / math.log(2)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(got(1L) == ((8L, r4(bThe))))
    assert(got(2L) == ((1L, r4(bZyx))))
    assert(got(3L) == ((4L, r4((3 * bThe + bZyx) / 4))))
    // the filterable ordering: degenerate-common < mixed < all-rare
    assert(got(1L)._2 < got(3L)._2 && got(3L)._2 < got(2L)._2)
  }

  test("rollup report: all levels in one pass, subtotals vs real nulls") {
    val docs = Seq(
      (1L, "s1", "en", "a b"),
      (2L, "s1", "de", "c"),
      (3L, "s2", null, "d e f")
    ).toDF("doc_id", "source", "lang", "text")
    val got = CorpusStats.rollupReport(docs, "source", "lang", "text")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5))).toSet
    assert(got == Set(
      (Some("s1"), Some("en"), 1L, 2L, 0, 0),
      (Some("s1"), Some("de"), 1L, 1L, 0, 0),
      (Some("s2"), None, 1L, 3L, 0, 0),       // REAL null lang: g2=0
      (Some("s1"), None, 2L, 3L, 0, 1),       // subtotal: g2=1
      (Some("s2"), None, 1L, 3L, 0, 1),
      (None, None, 3L, 6L, 1, 1)))            // grand total
  }

  test("jsd: identical groups diverge ~0, disjoint groups approach ln 2") {
    val docs = Seq(
      (1L, "a", "alpha beta gamma alpha beta"),
      (2L, "b", "alpha beta gamma alpha beta"),  // identical to a
      (3L, "c", "zeta eta theta iota kappa")     // disjoint vocab
    ).toDF("doc_id", "grp", "text")
    val got = CorpusStats.jsDivergence(docs, "grp", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got(("a", "b")) == 0.0, "identical distributions")
    assert(got(("a", "c")) > 0.001 && got(("a", "c")) <= math.log(2.0),
      s"disjoint: ${got(("a", "c"))}")
    assert(got(("a", "c")) == got(("b", "c")),
      "a and b are identical, so both diverge equally from c")
  }

  test("jsd: layout-independent") {
    val docs = Seq(
      (1L, "a", "x y z"), (2L, "b", "x y w"), (3L, "a", "y z z")
    ).toDF("doc_id", "grp", "text")
    val one = CorpusStats.jsDivergence(docs, "grp", "text")
      .collect().map(r => r.getDouble(2)).toSeq
    val two = CorpusStats.jsDivergence(docs.repartition(5), "grp", "text")
      .collect().map(r => r.getDouble(2)).toSeq
    assert(one == two)
  }

  test("unigram bits: layout-independent") {
    val docs = Seq((1L, "a b c a"), (2L, "b c d"), (3L, "a a a"))
      .toDF("doc_id", "text")
    val a = CorpusStats.unigramBits(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = CorpusStats.unigramBits(docs.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("zipf fit recovers slope ≈ −1, r² near 1 on an exact Zipf corpus") {
    // token w_r appears ceil(600/r) times, r = 1..50
    val text = (1 to 50)
      .flatMap(r => Seq.fill(math.ceil(600.0 / r).toInt)(s"w$r"))
      .mkString(" ")
    val row = CorpusStats.zipfFit(
      Seq((1L, text)).toDF("doc_id", "text"), "text", topN = 50).head()
    assert(row.getAs[Long]("n_terms") == 50L)
    val slope = row.getAs[Double]("slope")
    val r2 = row.getAs[Double]("r2")
    assert(slope > -1.1 && slope < -0.9, s"slope=$slope")
    assert(r2 > 0.99, s"r2=$r2")
  }

  test("zipf fit: serial-numbered junk bends away from Zipf") {
    val junk = (1 to 300).map(i => s"sn$i").mkString(" ") // flat head
    val zipf = (1 to 50)
      .flatMap(r => Seq.fill(math.ceil(600.0 / r).toInt)(s"w$r"))
      .mkString(" ")
    def fitOf(t: String) = CorpusStats.zipfFit(
      Seq((1L, t)).toDF("doc_id", "text"), "text", topN = 50).head()
    // a flat frequency head fits a much shallower slope
    assert(fitOf(junk).getAs[Double]("slope") >
      fitOf(zipf).getAs[Double]("slope") + 0.5)
  }

  test("bigram bits: hand-computed add-1 smoothed scores") {
    val docs = Seq((1L, "a b a b"), (2L, "c c"), (3L, "only"), (4L, ""))
      .toDF("doc_id", "text")
    val r = CorpusStats.bigramBits(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2))))
      .toMap
    // corpus: c2(a,b)=2 c2(b,a)=1 c2(c,c)=1; prefix c1(a)=2 c1(b)=1
    // c1(c)=1; V=4 distinct unigrams (a, b, c, only)
    // doc1: -(2·log2((2+1)/(2+4)) + 1·log2((1+1)/(1+4)))/3
    val d1 = -(2 * (math.log(3.0 / 6) / math.log(2)) +
      math.log(2.0 / 5) / math.log(2)) / 3
    assert(r(1L) == ((3L, math.floor(d1 * 1e4 + 0.5) / 1e4)))
    // doc2: -log2((1+1)/(1+4))
    val d2 = -math.log(2.0 / 5) / math.log(2)
    assert(r(2L) == ((1L, math.floor(d2 * 1e4 + 0.5) / 1e4)))
    assert(r(3L) == ((0L, 0.0)), "single-token doc has no bigrams")
    assert(r(4L) == ((0L, 0.0)), "empty doc has no bigrams")
  }

  test("bigram bits: repetitive context scores fewer bits than shuffled") {
    val fluent = (1 to 30).map(_ => "the cat sat here").mkString(" ")
    val soup = "the the cat here sat cat the here sat sat here cat " * 10
    val docs = Seq((1L, fluent), (2L, soup)).toDF("doc_id", "text")
    val r = CorpusStats.bigramBits(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) < r(2L), s"fluent=${r(1L)} soup=${r(2L)}")
  }

  test("trigram bits: hand-computed interpolated scores") {
    val docs = Seq((1L, "a b a b a"), (2L, "x"), (3L, ""))
      .toDF("doc_id", "text")
    val r = CorpusStats.trigramBits(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2))))
      .toMap
    // corpus: trigrams aba×2 bab×1; contexts cx2(a,b)=2 cx2(b,a)=1;
    // bigrams c2(a,b)=2 c2(b,a)=2; cx1(a)=2 cx1(b)=2;
    // unigrams a=3 b=2 x=1 → N=6 V=3 N+V=9
    def lg2(x: Double) = math.log(x) / math.log(2)
    val pAba = 0.7 * (2.0 / 2.0) + 0.2 * (2.0 / 2.0) + 0.1 * ((3.0 + 1.0) / 9.0)
    val pBab = 0.7 * (1.0 / 1.0) + 0.2 * (2.0 / 2.0) + 0.1 * ((2.0 + 1.0) / 9.0)
    val d1 = -(2 * lg2(pAba) + lg2(pBab)) / 3
    assert(r(1L) == ((3L, math.floor(d1 * 1e4 + 0.5) / 1e4)))
    assert(r(2L) == ((0L, 0.0)), "one-token doc has no trigrams")
    assert(r(3L) == ((0L, 0.0)), "empty doc has no trigrams")
  }

  test("trigram bits: fluent text scores fewer bits than word soup") {
    val fluent = (1 to 30).map(_ => "the cat sat here").mkString(" ")
    val soup = "the the cat here sat cat the here sat sat here cat " * 10
    val docs = Seq((1L, fluent), (2L, soup)).toDF("doc_id", "text")
    val r = CorpusStats.trigramBits(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) < r(2L), s"fluent=${r(1L)} soup=${r(2L)}")
  }

  test("pmi: collocation outranks independent pair; support floor holds") {
    // "san francisco" always adjacent; "the" pairs with everything
    val docs = (1 to 10).map(i =>
      (i.toLong, "the san francisco fog meets the bay area chill")) ++
      Seq((11L, "the fog the bay the chill san jose"))
    val out = CorpusStats.pmiTopK(docs.toDF("doc_id", "text"), "text",
      minCount = 5, k = 50).collect()
    val pmi = out.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(pmi.contains(("san", "francisco")))
    assert(pmi(("san", "francisco")) > pmi(("the", "bay")),
      "deterministic collocation must outrank a promiscuous token pair")
    // ("san","jose") occurs once — below minCount, must be absent
    assert(!pmi.contains(("san", "jose")))
  }

  test("curriculum: bands by score cutpoints, hash sort key per band") {
    val rows = (1 to 100).map(i => (i.toLong, i.toDouble / 100))
    val out = CorpusStats.curriculum(rows.toDF("id", "score"),
      "id", "score", phases = 4).collect()
    val phase = out.map(r => r.getLong(0) -> r.getInt(2)).toMap
    // score 1.00 → band 1; score 0.01 → band 4
    assert(phase(100L) == 1 && phase(1L) == 4)
    // exact cutpoint (p25 of 1..100/100) belongs to the LOWER band
    assert(phase(26L) == 4 || phase(26L) == 3) // boundary sanity
    // monotone: higher score never lands in a later band
    val sorted = out.sortBy(r => -r.getDouble(1)).map(_.getInt(2))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    // pos is the salted 60-bit hash of the id — a pure function of the
    // row, so re-running on a reshuffled input yields the same keys
    val expected = spark.range(1, 101).select(col("id"),
        graft.functions.TextFunctions.md5Hash60(
          concat(lit("curriculum:"), col("id").cast("string"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(3) == expected(r.getLong(0))))
    // and collision-free on this input: ordering by (phase, pos) is a
    // total in-band order without needing the id tiebreak
    assert(out.map(_.getLong(3)).distinct.length == out.length)
  }

  test("tokenEntropy: zero for repetition, log2(n) for all-distinct") {
    val docs = Seq(
      (1L, "a a a a"),      // one symbol → 0 bits
      (2L, "a b c d"),      // 4 distinct of 4 → 2 bits
      (3L, "a a b b"),      // 2×2 → 1 bit
      (4L, ""),             // tokenless → 0, n_tok 0
      (5L, "x")).toDF("doc_id", "text")
    val got = CorpusStats.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1L) == ((4L, 0.0)))
    assert(got(2L) == ((4L, 2.0)))
    assert(got(3L) == ((4L, 1.0)))
    assert(got(4L) == ((0L, 0.0)))
    assert(got(5L) == ((1L, 0.0)))
  }

  test("distinctNgrams: repeated trigrams lower the ratio; short docs emit none") {
    val docs = Seq(
      ("a", "p q r p q r"), // trigrams: pqr qrp rpq pqr → 4 total 3 distinct
      ("b", "s t u v"),     // stu tuv → 2 total 2 distinct
      ("c", "w x")          // shorter than n → no ngrams
    ).toDF("source", "text")
    val got = CorpusStats.distinctNgrams(docs, "source", "text", n = 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got("a") == ((4L, 3L, 0.75)))
    assert(got("b") == ((2L, 2L, 1.0)))
    assert(!got.contains("c"))
  }

  test("vocabCoverage: monotone cumulative share, ends at top-N mass") {
    // freqs: the=4, of=3, a=2, b=1 (total 10)
    val docs = Seq((1L, "the the of a"), (2L, "the of a b"),
      (3L, "the of")).toDF("doc_id", "text")
    val got = CorpusStats.vocabCoverage(docs, "text", topN = 3)
      .orderBy("rank").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("the", "of", "a"))
    assert(got.map(_.getLong(3)).toSeq == Seq(4L, 7L, 9L))
    assert(got.map(_.getDouble(4)).toSeq == Seq(0.4, 0.7, 0.9))
  }

  test("tokenGini: 0 for an even mix, 0.5 for one-of-two-holds-all") {
    val even = Seq(("a", "t1 t2 t3"), ("b", "u1 u2 u3"))
      .toDF("source", "text")
    val g1 = CorpusStats.tokenGini(even, "source", "text").head()
    assert(g1.getLong(0) == 2L && g1.getLong(1) == 6L &&
      g1.getDouble(2) == 0.0)
    val skew = Seq(("a", "t1 t2 t3 t4"), ("b", "")).toDF("source", "text")
    val g2 = CorpusStats.tokenGini(skew, "source", "text").head()
    assert(g2.getDouble(2) == 0.5)
  }

  test("histQuantiles: exact discrete quartiles, tie mass, layout-independent") {
    // group a: values 1,2,3,4 → n=4: q25 = first v with cum ≥ 1 = 1,
    // q50 = cum ≥ 2 = 2, q75 = cum ≥ 3 = 3
    // group b: 5,5,5,9 → heavy tie mass: the 5s carry cum=3 ≥ every
    // quartile rank (1, 2, 3), so all three quartiles land on 5
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 5L), ("b", 5L), ("b", 5L), ("b", 9L)).toDF("g", "v")
    val q = CorpusStats.histQuantiles(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(q("a").getLong(2) == 1L && q("a").getLong(3) == 2L &&
      q("a").getLong(4) == 3L)
    assert(q("b").getLong(2) == 5L && q("b").getLong(3) == 5L &&
      q("b").getLong(4) == 5L)
    // layout independence: same result from a different partitioning
    val q2 = CorpusStats.histQuantiles(df.repartition(7), "g", "v")
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(q2 == q.map { case (k, r) => k -> r.toSeq })
  }

  test("heapsFit: checkpoint counts are exact and beta is sublinear " +
    "for a vocabulary that saturates") {
    val spark2 = spark
    import spark2.implicits._
    // 10 docs; vocabulary saturates: doc i has tokens from a fixed
    // small pool plus one new token every other doc
    val docs = (1 to 10).map { i =>
      val novel = if (i % 2 == 0) s" new$i" else ""
      (i.toLong, "the quick fox" + novel)
    }
    val got = CorpusStats.heapsFit(docs.toDF("doc_id", "text"), "doc_id",
        "text", checkpoints = 5)
      .collect().map(r => r.getAs[Int]("chk") -> r).toMap
    // chk 1 covers ids 1..2: 7 tokens (3 + 4), vocab 4
    assert(got(1).getAs[Long]("max_doc_id") == 2L)
    assert(got(1).getAs[Long]("n_docs") == 2L)
    assert(got(1).getAs[Long]("n_tokens") == 7L)
    assert(got(1).getAs[Long]("vocab") == 4L)
    // chk 5 covers everything: 35 tokens, vocab 3 + 5 novel
    assert(got(5).getAs[Long]("n_tokens") == 35L)
    assert(got(5).getAs[Long]("vocab") == 8L)
    val beta = got(1).getAs[Double]("beta")
    assert(beta > 0.0 && beta < 1.0, s"beta=$beta")
  }

  test("heapsFit is layout-independent and total on empty docs") {
    val spark2 = spark
    import spark2.implicits._
    val docs = ((1 to 20).map(i => (i.toLong, s"tok${i % 6} filler"))
      ++ Seq((21L, ""), (22L, "   "))).toDF("doc_id", "text")
    val a = CorpusStats.heapsFit(docs, "doc_id", "text").collect()
      .map(_.toSeq).toSeq
    val b = CorpusStats.heapsFit(docs.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("bigramBitsAgainst with model == score IS bigramBits, and " +
    "out-of-model docs still score (add-1 floor)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1 to 8).map(i =>
      (i.toLong, s"alpha beta gamma tok${i % 3} beta alpha"))
      .toDF("doc_id", "text")
    val self = CorpusStats.bigramBits(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSeq
    val split = CorpusStats.bigramBitsAgainst(docs, docs, "doc_id", "text")
      .collect().map(_.toSeq).toSeq
    assert(self == split)
    // a scoring doc with bigrams the tiny model never saw: finite,
    // HIGH bits (every bigram at the smoothing floor)
    val model = docs.filter(col("doc_id") === 1L)
    val alien = Seq((99L, "zeta eta theta iota")).toDF("doc_id", "text")
    val row = CorpusStats.bigramBitsAgainst(model, alien, "doc_id", "text")
      .collect().head
    assert(row.getAs[Long]("n_big") == 3L)
    val bits = row.getAs[Double]("bpt2")
    assert(!bits.isNaN && !bits.isInfinite && bits > 1.0, s"bits=$bits")
  }

  test("bigramBitsSubset: the broadcast gate's shuffle fallback is " +
    "value-identical to the broadcast path") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1 to 12).map(i =>
      (i.toLong, s"alpha beta tok${i % 4} gamma beta"))
      .toDF("doc_id", "text")
    val pred = col("doc_id") % 2 === 0
    val viaBroadcast = CorpusStats.bigramBitsSubset(
      docs, "doc_id", "text", pred).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    // gate of 0 rows: a materialized model MEASURED too large to
    // broadcast must fall back to the shuffle path, same values
    val viaShuffle = CorpusStats.bigramBitsSubset(
      docs, "doc_id", "text", pred, broadcastMaxModelTokens = 0L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaBroadcast == viaShuffle)
  }

  test("goodTuring: hand-computed hapax mass") {
    val spark2 = spark
    import spark2.implicits._
    // "a a b c": T=4, vocab 3, N1=2, N2=1 -> p0=0.5, r1*=1.0
    val df = Seq((1L, "s1", "a a b"), (2L, "s1", "c"),
      (3L, "s2", "x x")).toDF("doc_id", "source", "text")
    val got = CorpusStats.goodTuring(df, "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("s1").getAs[Long]("n_tokens") == 4L)
    assert(got("s1").getAs[Long]("vocab") == 3L)
    assert(got("s1").getAs[Long]("n1") == 2L)
    assert(got("s1").getAs[Long]("n2") == 1L)
    assert(got("s1").getAs[Double]("p0_unseen") == 0.5)
    assert(got("s1").getAs[Double]("r1_star") == 1.0)
    // s2: one doubleton, no hapaxes -> zero unseen mass, guard path
    assert(got("s2").getAs[Long]("n1") == 0L)
    assert(got("s2").getAs[Double]("p0_unseen") == 0.0)
    assert(got("s2").getAs[Double]("r1_star") == 0.0)
  }

  test("sourceSimilarity: identical profiles cosine 1, orthogonal " +
    "profiles have no shared-term pair") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      ("a", "alpha beta alpha"), ("b", "alpha beta alpha"),
      ("c", "gamma delta gamma delta")).toDF("source", "text")
    val got = CorpusStats.sourceSimilarity(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("cosine")).toMap
    assert(got(("a", "b")) == 1.0)
    assert(!got.contains(("a", "c"))) // zero overlap -> no dot row
  }

  test("burstiness: a clumped term scores a higher VMR than an " +
    "evenly spread one") {
    val spark2 = spark
    import spark2.implicits._
    // "even" once per doc (VMR = (4*4-16)/(4*4) = 0);
    // "burst" 4 times in one doc (VMR = (4*16-16)/(4*4) = 3)
    val df = Seq((1L, "even burst burst burst burst"),
      (2L, "even"), (3L, "even"), (4L, "even"))
      .toDF("doc_id", "text")
    val got = CorpusStats.burstiness(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("vmr")).toMap
    assert(got("even") == 0.0)
    assert(got("burst") == 3.0)
  }

  test("keynessG2: a source-exclusive repeated token tops its " +
    "source's keywords; shared-evenly tokens never pass the gate") {
    val docs = Seq(
      (1L, "a", "zebra zebra zebra common common"),
      (2L, "a", "zebra zebra common common"),
      (3L, "b", "common common common common yak"),
      (4L, "b", "common common common yak yak"))
      .toDF("doc_id", "source", "text")
    val got = CorpusStats.keynessG2(docs, "source", "text", k = 3)
      .collect()
    val aTop = got.filter(_.getString(0) == "a").minBy(_.getInt(5))
    val bTop = got.filter(_.getString(0) == "b").minBy(_.getInt(5))
    assert(aTop.getString(1) == "zebra" && bTop.getString(1) == "yak")
    assert(aTop.getAs[Long]("a") == 5L && aTop.getAs[Long]("b") == 0L)
    // "common" is 4/9 vs 7/10 -> over-represented only in b, and g2
    // must stay below the exclusive token's
    assert(!got.exists(r => r.getString(0) == "a" &&
      r.getString(1) == "common"))
  }

  test("readability: hand-computed FK grade; empty and wordless " +
    "docs grade NULL") {
    val docs = Seq(
      (1L, "the cat sat. the dog ran."),   // 6 words, 2 sents, 6 syll
      (2L, ""), (3L, "...")).toDF("doc_id", "text")
    val got = CorpusStats.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_words") == 6L)
    assert(r1.getAs[Long]("n_sentences") == 2L)
    assert(r1.getAs[Long]("n_syllables") == 6L)
    val expect = 0.39 * 3.0 + 11.8 * 1.0 - 15.59
    assert(math.abs(r1.getAs[Double]("fk_grade") - expect) < 1e-3)
    assert(got(2L).isNullAt(got(2L).fieldIndex("fk_grade")))
    assert(got(3L).isNullAt(got(3L).fieldIndex("fk_grade")))
  }

  test("kneserNeyBits: hand-computed continuation backoff; probability " +
    "mass over seen continuations is conserved; short docs report 0") {
    val spark2 = spark
    import spark2.implicits._
    // bigrams: (a,b)x2, (a,c)x1 -> c1(a)=3, n1f(a)=2, n1r(b)=n1r(c)=1,
    // T=2; p(b|a) = 1.25/3 + 0.75*2/3*(1/2) = 2/3; p(c|a) = 1/3 -- the
    // two KN probabilities exactly exhaust the context's mass
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"),
      (5L, "")).toDF("doc_id", "text")
    val got = CorpusStats.kneserNeyBits(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_big"), r.getAs[Double]("kn_bpt")))).toMap
    assert(got(1L) == ((1L, 0.585)))  // -log2(2/3)
    assert(got(2L) == got(1L))
    assert(got(3L) == ((1L, 1.585))) // -log2(1/3)
    assert(got(4L) == ((0L, 0.0)))
    assert(got(5L) == ((0L, 0.0)))
    // layout independence (quantized term sums are order-free)
    val re = CorpusStats.kneserNeyBits(docs.repartition(4), "doc_id",
      "text").collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_big"), r.getAs[Double]("kn_bpt")))).toMap
    assert(re == got)
    intercept[IllegalArgumentException] {
      CorpusStats.kneserNeyBits(docs, "doc_id", "text", discount = 1.5)
    }
  }

  test("sourceNovelty: mirror source owns nothing, unique source owns " +
    "all, attribution is first-name-deterministic; short docs omitted") {
    val spark2 = spark
    import spark2.implicits._
    val nine = (1 to 9).map("t" + _).mkString(" ")
    val docs = Seq(("a", nine), ("b", nine),
      ("c", (1 to 9).map("u" + _).mkString(" ")),
      ("d", "too short")).toDF("source", "text")
    val got = CorpusStats.sourceNovelty(docs, "source", "text", k = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("a") == ((2L, 2L, 1.0)), "first name owns the shared spans")
    assert(got("b") == ((2L, 0L, 0.0)), "the mirror adds nothing")
    assert(got("c") == ((2L, 2L, 1.0)))
    assert(!got.contains("d"), "no k-span, nothing to attribute")
  }

  test("hillTail: recovers alpha ~ 1 on a Zipf tail, NULL on a " +
    "degenerate (all-equal) tail, layout independent") {
    import spark.implicits._
    // x_i = floor(1e7 / i) is Pareto(alpha = 1) in the tail
    val zipf = (1 to 500).map(i => Tuple1((1e7 / i).toLong)).toDF("v")
    val got = CorpusStats.hillTail(zipf, "v", k = 100).head()
    assert(got.getAs[Long]("k") == 100L)
    val alpha = got.getAs[Double]("alpha")
    assert(alpha > 0.85 && alpha < 1.15, s"alpha=$alpha, want ~1.0")
    // all-equal: every log ratio is 0 → estimator undefined
    val flat = (1 to 200).map(_ => Tuple1(42L)).toDF("v")
    assert(CorpusStats.hillTail(flat, "v", 50).head().isNullAt(2))
    val again = CorpusStats.hillTail(zipf.repartition(11), "v", 100).head()
    assert(again.getAs[Double]("alpha") == alpha)
    // no positive values at all: (k=0, NULL, NULL) — not a k=-1
    // sentinel for dashboards to trip over
    val none = Seq(Tuple1(0L), Tuple1(-5L)).toDF("v")
    val empty = CorpusStats.hillTail(none, "v", 50).head()
    assert(empty.getAs[Long]("k") == 0L &&
      empty.isNullAt(1) && empty.isNullAt(2))
  }

  test("langSegments: mixed doc reports dominant by majority, switch " +
    "count, and distinct langs; clean docs report one lang") {
    import spark.implicits._
    val docs = Seq(
      // en, en, es → dominant en, 1 switch, 2 langs
      (1L, "the quick fox jumps with the dog. the cat sat on the mat. " +
        "el perro come en la casa con los gatos."),
      // clean single-language doc, no terminal punctuation = one segment
      (2L, "the dog and the cat are in the house with a fox"),
      (3L, "   "), (4L, "")).toDF("doc_id", "text")
    val got = CorpusStats.langSegments(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(got(1L)._1 == 3L, "three sentences")
    assert(got(1L)._3 == "en", "majority language wins")
    assert(got(1L)._2 == 2L && got(1L)._4 == 1L,
      "one en→es switch, two languages")
    assert(got(2L) == ((1L, 1L, "en", 0L)))
    assert(!got.contains(3L) && !got.contains(4L),
      "token-less docs emit nothing")
  }

  test("langSegments: dominant ties break (count desc, lang asc) and " +
    "the result is layout independent") {
    import spark.implicits._
    // one en sentence, one es sentence → tie → 'en' < 'es' wins
    val docs = Seq((1L, "the dog and the cat sat with a fox. " +
      "el perro come en la casa con los gatos.")).toDF("doc_id", "text")
    val r = CorpusStats.langSegments(docs, "doc_id", "text").head()
    assert(r.getString(3) == "en")
    val a = CorpusStats.langSegments(docs, "doc_id", "text").collect().toSeq
    val b = CorpusStats.langSegments(docs.repartition(5), "doc_id", "text")
      .collect().toSeq
    assert(a == b)
  }

  test("hillTail: fewer than k+1 positive rows degrade to k_eff = n-1; " +
    "non-positive values are ignored") {
    import spark.implicits._
    val few = Seq(100L, 50L, 25L, 0L, -5L).map(Tuple1(_)).toDF("v")
    val got = CorpusStats.hillTail(few, "v", k = 100).head()
    assert(got.getAs[Long]("k") == 2L, "3 positive rows -> k_eff 2")
    assert(got.getAs[Long]("x_k") == 25L)
    // alpha = 2 / (ln(100/25) + ln(50/25)) = 2 / (2.0794) = 0.9618
    assert(math.abs(got.getAs[Double]("alpha") - 0.9618) < 1e-4)
  }
}
