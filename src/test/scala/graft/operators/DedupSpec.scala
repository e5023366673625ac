package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 0/1 near-identical (one word differs), 2 identical to 0, 3 unrelated
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (1L, "the quick brown fox jumps over the lazy cat again and again", "en"),
    (2L, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (3L, "completely different content about spark query engines at scale", "en")
  ).toDF("doc_id", "text", "lang")

  test("lshDesignSweep: exact pairs give analytic certainty at b=32/r=1, " +
    "deep rows crush recall, and the hand case checks out") {
    import spark.implicits._
    // two verified pairs at j=1.0 and j=0.5
    val pairs = Seq((1L, 2L, 1.0), (3L, 4L, 0.5))
      .toDF("id_a", "id_b", "jaccard")
    val got = Dedup.lshDesignSweep(pairs, "jaccard", totalHashes = 32)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set((1, 32), (2, 16), (4, 8), (8, 4), (16, 2),
      (32, 1)), "every factorization of the budget")
    assert(got.values.forall(_._1 == 2L))
    // j=1 detects always; j=0.5 at (32,1): 1-(1-0.5)^32 ≈ 1 → mean 1.0
    assert(got((32, 1))._2 == 1.0)
    // (1,32): j=0.5 → 0.5^32 ≈ 2.3e-10 → mean ≈ 0.5; j=1 → 1
    assert(got((1, 32))._2 == 0.5)
    // deployed 8×4: 1-(1-0.5^4)^8 = 0.40328... → mean (1+0.40328)/2
    // → 0.70164 → 4dp floor-round 0.7016
    assert(got((8, 4))._2 == 0.7016)
    // recall is monotone in bands for fixed budget on this population
    val ordered = Seq((1, 32), (2, 16), (4, 8), (8, 4), (16, 2), (32, 1))
      .map(got(_)._2)
    assert(ordered == ordered.sorted)
  }

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs, "doc_id", "text")
    assert(r.count() == 3)
    val dup = r.filter($"n_copies" === 2).head()
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("minhash LSH surfaces the near-dup pair with high estimated jaccard") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // identical pair (0,2) must estimate 1.0; near-dup (0,1)/(1,2) high
    assert(pairs.exists { case (a, b, j) => a == 0 && b == 2 && j == 1.0 })
    assert(pairs.filter { case (a, b, _) => (a, b) == (0L, 1L) || (a, b) == (1L, 2L) }
      .forall(_._3 > 0.5))
    assert(!pairs.exists { case (a, b, _) => b == 3 || a == 3 })
  }

  test("winnowing: identical docs identical fp; shared substring of " +
    "length >= w+k-1 guarantees a shared fingerprint; short docs degrade") {
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fp(0L) == fp(2L), "identical docs → identical fingerprints")
    // docs 0/1 share long runs ("the quick brown fox jumps over the lazy ")
    assert(fp(0L).toSet.intersect(fp(1L).toSet).nonEmpty,
      "winnowing guarantee: shared run of >= w+k-1 chars shares a hash")
    assert(fp(0L).toSet.intersect(fp(3L).toSet).isEmpty,
      "no shared 8-gram → no shared fingerprint")
    val shorts = Seq((10L, ""), (11L, "abcdefg"), (12L, "abcdefgh"),
      (13L, "abcdefghij")).toDF("doc_id", "text")
    val sfp = Dedup.winnowFingerprints(shorts, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sfp(10L).isEmpty && sfp(11L).isEmpty, "shorter than k → empty")
    assert(sfp(12L).length == 1, "exactly one gram → one fingerprint")
    assert(sfp(13L).length == 1, "fewer hashes than w → global min only")
  }

  test("winnow overlap pairs: copies above containment, unrelated absent") {
    val pairs = Dedup.winnowOverlapPairs(docs, "doc_id", "text",
      minContainment = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs((0L, 2L)) == 1.0, "identical docs → containment 1.0")
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash: identical texts equal, near-dups within small hamming") {
    val sigs = docs.select($"doc_id", Dedup.simhash32($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(1L)) <= 8)
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(3L)) > 8)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)) && pairs.contains((0L, 1L)))
  }

  test("simhashTable: empty and NULL texts both map to signature 0") {
    val weird = Seq((1L, Some("real text here")), (2L, Some("")),
      (3L, Some("   ")), (4L, None))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhashTable(weird, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(2L) == 0L && sigs(3L) == 0L)
    assert(sigs(4L) == 0L, "NULL text matches the old rejoin default of 0")
    assert(sigs(1L) != 0L)
  }

  test("cluster resolution is transitive: A~B, B~C → one cluster, min id keeps") {
    import org.apache.spark.sql.functions.lit
    val all = Seq(0L, 1L, 2L, 7L).toDF("doc_id")
    // chain 1-2, 2-7 (no direct 1-7 pair); 0 is a singleton
    val pairs = Seq((1L, 2L), (2L, 7L)).toDF("id_a", "id_b")
      .withColumn("est_jaccard", lit(1.0)).withColumn("jaccard", lit(1.0))
    // both paths must agree: driver union-find and distributed fixpoint
    Seq(1000000L, 0L).foreach { threshold =>
      val r = Dedup.resolveClusters(all, "doc_id", pairs,
        driverMaxEdges = threshold)
        .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
      assert(r(0L) == (0L, true), s"threshold=$threshold")
      assert(r(1L) == (1L, true), s"threshold=$threshold")
      assert(r(2L) == (1L, false), s"threshold=$threshold")
      assert(r(7L) == (1L, false), s"threshold=$threshold") // via 2
    }
  }

  test("cluster resolution: edges touching ids absent from allDocs are " +
    "inert on BOTH paths (induced-subgraph semantics)") {
    import org.apache.spark.sql.functions.lit
    val all = Seq(5L, 9L).toDF("doc_id")
    // 0 is not a doc: (0,5) must be dropped, (5,9) must still cluster
    val pairs = Seq((0L, 5L), (5L, 9L)).toDF("id_a", "id_b")
      .withColumn("est_jaccard", lit(1.0)).withColumn("jaccard", lit(1.0))
    Seq(1000000L, 0L).foreach { threshold =>
      val r = Dedup.resolveClusters(all, "doc_id", pairs,
        driverMaxEdges = threshold)
        .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
      assert(r(5L) == (5L, true), s"threshold=$threshold")
      assert(r(9L) == (5L, false), s"threshold=$threshold")
    }
  }

  test("driverMaxEdges gate: distributed fixpoint equals the driver " +
    "union-find on a random graph + worst-case chain (the 100 TB " +
    "degradation path, exercised every round)") {
    import org.apache.spark.sql.functions.lit
    val rnd = new scala.util.Random(13)
    val n = 120
    // random sparse graph plus a 30-node path (worst-case diameter for
    // the label-propagation fixpoint) and untouched singletons
    val chain = (0 until 29).map(i => (1000L + i, 1001L + i))
    val random = (1 to 150).map { _ =>
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val allDocs = ((0L until n.toLong) ++ (1000L to 1029L) ++
      Seq(5000L, 5001L)).toDF("doc_id")
    val pairs = (random ++ chain).toDF("id_a", "id_b")
      .withColumn("est_jaccard", lit(1.0)).withColumn("jaccard", lit(1.0))
    def labels(threshold: Long) =
      Dedup.resolveClusters(allDocs, "doc_id", pairs,
        driverMaxEdges = threshold)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val driver = labels(1000000L) // driver union-find fast path
    val dist = labels(0L)         // forced distributed fixpoint
    assert(driver == dist,
      "both paths must assign identical cluster labels and keepers")
    // sanity on the shapes: the chain is one cluster labeled by its min
    assert(driver(1029L) == ((1000L, false)))
    assert(driver(5000L) == ((5000L, true)), "singletons keep themselves")
  }

  test("ngram jaccard: identical 1.0, near-dup high, blocked pairs only") {
    val r = Dedup.ngramJaccard(docs, "doc_id", "text", blockCol = "lang",
      minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(r((0L, 2L)) == 1.0)
    assert(r((0L, 1L)) > 0.7)
    assert(!r.contains((0L, 3L)))
  }

  test("ngram jaccard on pairs = full form ∩ pairs (x245 ≡ x05 restricted)") {
    // full blocked form (the spec-only harness — retired from the
    // catalog in round 13) vs the candidate-restricted scale form:
    // on the pair list they share, values must be IDENTICAL, and
    // pairs outside the list (or outside the block) must be absent.
    val full = Dedup.ngramJaccard(docs, "doc_id", "text", blockCol = "lang",
      minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(full.nonEmpty)
    val somePairs = full.keys.toSeq.sorted.take(2) ++ Seq((0L, 999L))
    val pairsDf = somePairs.toDF("id_a", "id_b")
    val got = Dedup.ngramJaccardOnPairs(docs, "doc_id", "text",
      blockCol = "lang", pairs = pairsDf, minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == somePairs.take(2).map(p => p -> full(p)).toMap,
      "restricted form must equal the full form on the given pairs " +
        "and drop pairs whose endpoints are missing")
    // cross-block pair: both docs exist but in different blocks → dropped
    val crossBlock = Dedup.ngramJaccardOnPairs(docs, "doc_id", "text",
      blockCol = "lang", pairs = Seq((0L, 3L)).toDF("id_a", "id_b"),
      minJaccard = 0.0).count()
    assert(crossBlock == full.count { case ((a, b), _) => a == 0L && b == 3L },
      "pairs the full blocked form never examines must stay absent")
  }

  test("line boilerplate: common lines strip, unique/blank lines survive, order kept") {
    val docs = Seq(
      (1L, "unique alpha\ncommon footer\n\nbody one"),
      (2L, "body two\ncommon footer\nunique beta"),
      (3L, "common footer\nbody three"),
      (4L, "no shared lines here at all"),
      (5L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.lineBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // 'common footer' appears in 3 docs >= minDocs → stripped everywhere
    assert(got(1L) == ((4L, 3L, "unique alpha\n\nbody one")))
    assert(got(2L) == ((3L, 2L, "body two\nunique beta")))
    assert(got(3L) == ((2L, 1L, "body three")))
    // untouched doc reassembles byte-identically
    assert(got(4L) == ((1L, 1L, "no shared lines here at all")))
    // empty doc: one blank line, kept (blank lines are never boilerplate)
    assert(got(5L) == ((1L, 1L, "")))
  }

  test("line boilerplate: blank lines never count toward doc frequency") {
    val docs = (1L to 10L).map(i => (i, s"body $i\n\nbody tail $i"))
      .toDF("doc_id", "text")
    val got = Dedup.lineBoilerplate(docs, "doc_id", "text", minDocs = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // the blank middle line is in all 10 docs but must survive
    assert(got.forall(_ == ((3L, 3L))))
    intercept[IllegalArgumentException] {
      Dedup.lineBoilerplate(docs, "doc_id", "text", minDocs = 1)
    }
  }

  test("maxBucket valve: mega-bucket pairs are capped AND reported, " +
    "not silently dropped") {
    val boiler = "subscribe to our newsletter for daily updates and " +
      "follow us on social media all rights reserved"
    // 30 identical boilerplate docs (every band bucket holds all 30)
    // in a sea of 200 distinct docs
    val docs = ((1L to 30L).map(i => (i, boiler)) ++
      (100L to 299L).map(i =>
        (i, s"wholly distinct document number $i talking about topic " +
          s"${i % 7} in its own words ${i * 31}")))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashLsh(docs, "doc_id", "text", maxBucket = 10)
    val cappedPairs = capped.collect()
    // no boilerplate×boilerplate pair survives the valve (those would
    // be 30·29/2 = 435 pairs)
    assert(!cappedPairs.exists(r => r.getLong(0) <= 30L && r.getLong(1) <= 30L),
      "mega-bucket pairs must be excluded by the cap")
    // the drop is REPORTED: every boilerplate band bucket (8 of them,
    // all 30 docs) shows up with its size
    val dropped = Dedup.lshDroppedBuckets(docs, "doc_id", "text",
      maxBucket = 10).collect()
    assert(dropped.nonEmpty, "capped run must report its dropped buckets")
    assert(dropped.forall(_.getLong(1) > 10L),
      s"only oversized buckets may be reported: ${dropped.toSeq}")
    assert(dropped.count(_.getLong(1) == 30L) == 8,
      s"all 8 boilerplate band buckets must be reported: ${dropped.toSeq}")
    // uncapped control: the valve was load-bearing
    val uncapped = Dedup.minhashLsh(docs, "doc_id", "text", maxBucket = 0)
      .collect()
    assert(uncapped.count(r => r.getLong(0) <= 30L && r.getLong(1) <= 30L)
      == 435, "without the cap the mega-bucket pairs all materialize")
    // and nothing was dropped that wasn't oversized
    assert(Dedup.lshDroppedBuckets(docs, "doc_id", "text",
      maxBucket = 1000).collect().isEmpty)
  }

  test("containment: embedded doc scores ~1.0 where jaccard stays low") {
    val short = "the quick brown fox jumps over the lazy dog tonight"
    val long = short + " " + (1 to 40).map(i => s"filler sentence $i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, "totally unrelated words"))
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", cands,
      minContainment = 0.9).collect()
    assert(out.length == 1, "unrelated pair must not survive the threshold")
    val r = out.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Double]("containment") >= 0.99)
    assert(r.getAs[Long]("contained_id") == 1L, "short doc is the contained one")
    // the same pair's Jaccard is far below near-dup thresholds — the
    // asymmetric signal is real, not a re-labeled jaccard
    assert(r.getAs[Long]("n_inter").toDouble /
      (r.getAs[Long]("n_a") + r.getAs[Long]("n_b") -
        r.getAs[Long]("n_inter")) < 0.35)
  }

  test("keepFirstLines: exactly one copy survives, corpus order wins") {
    val docs = Seq(
      (1L, "x\ny"),
      (2L, "y\nz"),
      (3L, "x\nz"),
      (4L, "q\nq"),     // intra-doc repeat: first pos survives
      (5L, "a\n\nb"),   // blank lines always kept
      (6L, "a\n\nb"))
      .toDF("doc_id", "text")
    val got = Dedup.keepFirstLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, "x\ny")))     // first sees both
    assert(got(2L) == ((2L, 1L, "z")))        // y already taken by doc 1
    assert(got(3L) == ((2L, 0L, "")))         // both lines taken
    assert(got(4L) == ((2L, 1L, "q")))        // second q dropped
    assert(got(5L) == ((3L, 3L, "a\n\nb")))
    assert(got(6L) == ((3L, 1L, "")))         // only its blank survives
    // global invariant: every distinct non-blank line survives exactly once
    val totalKept = got.values.map(_._2).sum
    assert(totalKept == 2 + 1 + 0 + 1 + 3 + 1)
  }

  test("spanning edges: linear pair count per replica clique, identical clusters") {
    // two replica cliques (the pathological dedup input: N copies of one
    // doc) + one unrelated singleton. all-pairs emits C(n,2) per clique;
    // spanning must emit n-1 star edges and resolve the SAME clusters.
    val n = 12
    val clique1 = (0 until n).map(i => (100L + i,
      "replicated boilerplate about subscribing to our newsletter " +
        "for daily updates and following us on social media", "en"))
    val clique2 = (0 until n).map(i => (200L + i,
      "another heavily duplicated passage regarding terms of service " +
        "privacy policy and cookie settings on this website", "en"))
    val corpus = (clique1 ++ clique2 :+
      ((300L, "completely unrelated text about distributed query " +
        "engines and columnar storage formats", "en")))
      .toDF("doc_id", "text", "lang")

    val allPairs = Dedup.nearDupPipeline(corpus, "doc_id", "text")
    val starPairs = Dedup.nearDupPipeline(corpus, "doc_id", "text",
      edges = "spanning")
    // pair-count shape: C(n,2) per clique vs n-1 per clique
    assert(allPairs.count() == 2L * n * (n - 1) / 2, "all-pairs quadratic")
    assert(starPairs.count() == 2L * (n - 1), "spanning linear")
    // every spanning edge is a star from the clique minimum
    assert(starPairs.select("id_a").distinct().as[Long].collect().toSet
      == Set(100L, 200L))
    // the clusters (and therefore keepers) are identical
    def clusters(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.resolveClusters(corpus, "doc_id", pairs)
        .select("doc_id", "cluster_id", "keep")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    assert(clusters(allPairs) == clusters(starPairs))
  }

  test("templateClusters: instances sharing a skeleton cluster " +
    "despite different variable lines; skeleton-free docs never do") {
    import spark.implicits._
    val docs = Seq(
      (1L, "head\nnav\nbody one\nfoot"),
      (2L, "head\nnav\nbody two\nfoot"),
      (3L, "head\nnav\nsomething else\nfoot"),
      (4L, "totally\nunrelated\nlines"),
      (5L, "also\nnothing shared")
    ).toDF("doc_id", "text")
    val got = Dedup.templateClusters(docs, "doc_id", "text").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_docs") == 3L)
    assert(got.head.getAs[Long]("keep_id") == 1L)
  }

  test("templateClusters: a doc missing ONE skeleton line is a " +
    "different template; layout-independent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "head\nfoot\nx"), (2L, "head\nfoot\ny"),
      (3L, "head\nz\nw"), (4L, "head\nq")
    ).toDF("doc_id", "text")
    // skeleton lines: head (df 4), foot (df 2). Docs 1,2 -> {head,foot};
    // docs 3,4 -> {head}: two clusters
    val a = Dedup.templateClusters(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("keep_id"))).toSet
    assert(a == Set((2L, 1L), (2L, 3L)))
    val b = Dedup.templateClusters(docs.repartition(7), "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("keep_id"))).toSet
    assert(a == b)
  }

  test("weightedJaccard: frequency-aware overlap under-scores the " +
    "looped pair set semantics calls identical; disjoint pair is 0; " +
    "non-pair docs never tokenize into the result") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "a b"), (3L, "x y"),
      (4L, "noise not in any pair")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.weightedJaccard(docs, "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("sum_min"), r.getAs[Long]("sum_max"),
          r.getAs[Double]("w_jaccard")))).toMap
    // (1,2): same vocabulary {a,b} (set Jaccard 1.0) but counts
    // 3a+1b vs 1a+1b -> min 2 / max 4 = 0.5
    assert(got((1L, 2L)) == ((2L, 4L, 0.5)))
    assert(got((1L, 3L)) == ((0L, 6L, 0.0)))
    assert(got.size == 2)
  }

  test("weightedJaccard: byte-identical pair scores exactly 1.0; " +
    "empty-text pair guards the zero denominator") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a b a"), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.weightedJaccard(docs, "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("w_jaccard")).toMap
    assert(got((1L, 2L)) == 1.0)
    assert(got((3L, 4L)) == 0.0, "no tokens on either side -> 0, not NaN")
  }

  test("weightedJaccard: duplicated pair rows neither inflate the " +
    "exact sums nor duplicate output rows") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "a b")).toDF("doc_id", "text")
    // the same pair delivered 3× (an un-deduped LSH candidate list) —
    // without the input distinct, ga×gb would multiply token matches
    // quadratically (sum_min 2→18, sum_max 4→36)
    val pairs = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("id_a", "id_b")
    val rows = Dedup.weightedJaccard(docs, "doc_id", "text", pairs)
      .collect()
    assert(rows.length == 1, "one output row per distinct pair")
    val r = rows.head
    assert((r.getAs[Long]("sum_min"), r.getAs[Long]("sum_max"),
      r.getAs[Double]("w_jaccard")) == ((2L, 4L, 0.5)))
  }

  test("resolveClusters: driver union-find mapping is complete on the " +
    "exact 24-edge graph that once lost 10 of 23 entries (r15: mapping " +
    "over the LIVE keySet while path compression resized the map)") {
    val spark2 = spark
    import spark2.implicits._
    // the label graph from the StreamCuration drain where mutable.
    // HashMap.put grew the table mid-iteration: before the key-snapshot
    // fix, 10 of these nodes silently fell back to self labels
    val es = Seq((0L, 50L), (0L, 82L), (5L, 450L), (8L, 12L), (16L, 369L),
      (26L, 176L), (33L, 436L), (45L, 487L), (50L, 82L), (56L, 157L),
      (77L, 459L), (89L, 114L), (95L, 138L), (110L, 467L), (119L, 425L),
      (144L, 161L), (205L, 251L), (211L, 404L), (229L, 263L),
      (260L, 391L), (270L, 329L), (328L, 428L), (349L, 411L),
      (430L, 482L))
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.toDF("doc_id")
    val pairs = es.toDF("id_a", "id_b")
    val got = Dedup.resolveClusters(nodes, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 22 components, each labeled by its min; 23 nodes relabel
    val expected = es.foldLeft(Map.empty[Long, Long]) { case (acc, (a, b)) =>
      // tiny reference union-find over immutable state
      def root(m: Map[Long, Long], x: Long): Long =
        if (m.getOrElse(x, x) == x) x else root(m, m(x))
      val (ra, rb) = (root(acc, a), root(acc, b))
      if (ra == rb) acc
      else if (ra < rb) acc + (rb -> ra) else acc + (ra -> rb)
    }
    def root(x: Long): Long =
      if (expected.getOrElse(x, x) == x) x else root(expected(x))
    nodes.as[Long].collect().foreach { n =>
      assert(got(n) == root(n), s"node $n: got ${got(n)}, want ${root(n)}")
    }
    assert(got.count { case (n, l) => n != l } == 23,
      "all 23 non-min nodes must relabel")
  }
}
