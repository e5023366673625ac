package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map(i =>
    (i, if (i % 4 == 0) "en" else "de")).toDF("doc_id", "lang")

  test("deterministic sample: rate honored, layout-independent, replayable") {
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    // rate within binomial noise of 25% over 2000 ids
    assert(s1.size > 380 && s1.size < 620, s"got ${s1.size}")
    // identical decision under a different partition layout (df.sample
    // would diverge here — that's the whole point of the hash gate)
    val s2 = Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    // monotone in rate: a 10% sample is a subset of the 25% sample
    val s3 = Sampling.deterministicSample(docs, "doc_id", 0.10)
      .select("doc_id").as[Long].collect().toSet
    assert(s3.subsetOf(s1))
    // a different salt draws a genuinely different sample
    val s4 = Sampling.deterministicSample(docs, "doc_id", 0.25, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(s4 != s1)
  }

  test("prioritySample: weight-biased, deterministic, layout-independent") {
    // ids 0..49 carry weight 10000, the rest weight 1 — the heavy rows
    // must dominate a k=50 sample drawn weight-proportionally
    val rows = (0L until 1000L).map(i =>
      (i, if (i < 50) 10000L else 1L)).toDF("id", "w")
    val got = Sampling.prioritySample(rows, "id", "w", k = 50)
    val ids = got.select("doc_id").as[Long].collect().toSet
    assert(ids.size == 50)
    assert(ids.count(_ < 50L) >= 40, s"heavy=${ids.count(_ < 50L)}")
    // replayable: identical set under a different partition layout
    val again = Sampling.prioritySample(rows.repartition(7), "id", "w",
      k = 50).select("doc_id").as[Long].collect().toSet
    assert(again == ids)
    // ranks are 1..k ascending by key
    val ks = got.orderBy("rn").select("prio_key").as[Double].collect()
    assert(ks.zip(ks.tail).forall { case (a, b) => a <= b })
    assert(got.select("rn").as[Int].collect().sorted.toSeq ==
      (1 to 50).toSeq)
  }

  test("shardBalance: partition of the corpus, token-mass accounting, skew ~1") {
    val rows = (0L until 4000L).map(i => (i, "tok " * (1 + (i % 5).toInt)))
      .toDF("id", "text")
    val got = Sampling.shardBalance(rows, "id", "text", shards = 8)
      .collect()
    assert(got.length == 8)
    assert(got.map(_.getLong(1)).sum == 4000L, "every doc lands in a shard")
    val totTok = got.map(_.getLong(2)).sum
    assert(totTok == (0L until 4000L).map(i => 1 + (i % 5)).sum)
    // hash sharding concentrates near 1.0 at a few hundred docs/shard
    assert(got.map(_.getDouble(3)).forall(s => s > 0.8 && s < 1.2),
      got.map(_.getDouble(3)).mkString(","))
    // replayable under a different layout
    val again = Sampling.shardBalance(rows.repartition(13), "id", "text",
      shards = 8).collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(again == got.map(r => r.getInt(0) -> r.getLong(2)).toMap)
  }

  test("stratified sample applies per-stratum rates") {
    val got = Sampling.stratifiedSample(docs, "doc_id", "lang",
      rates = Map("en" -> 0.8), defaultRate = 0.1)
    val byLang = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 500 en docs at 80%, 1500 de docs at 10%
    assert(byLang("en") > 350 && byLang("en") <= 500, s"en=${byLang("en")}")
    assert(byLang("de") > 80 && byLang("de") < 250, s"de=${byLang("de")}")
  }

  test("mix rebalance hits the target proportions, binding stratum keeps all") {
    // 400 en / 100 de / 60 es; target 50/20/30 -> budget = min(800, 500,
    // 200) = 200 -> keep ~100 en (rate .25), ~40 de (rate .4), 60 es (rate 1)
    val mixDocs = ((1 to 400).map(i => (i.toLong, "en")) ++
      (1 to 100).map(i => (1000L + i, "de")) ++
      (1 to 60).map(i => (2000L + i, "es")) ++
      (1 to 30).map(i => (3000L + i, "zh"))) // not in target -> dropped
      .toDF("doc_id", "lang")
    val got = Sampling.rebalanceMix(mixDocs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.2, "es" -> 0.3))
    val byLang = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("zh"), "non-target strata are dropped")
    assert(byLang("es") == 60, "binding stratum keeps everything")
    // hash-gate sampling is approximate per stratum; proportions should
    // land near the target within sampling noise
    assert(byLang("en") > 70 && byLang("en") < 130, s"en=${byLang("en")}")
    assert(byLang("de") > 22 && byLang("de") < 58, s"de=${byLang("de")}")
    // deterministic: same inputs -> same rows
    val again = Sampling.rebalanceMix(mixDocs.repartition(7), "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.2, "es" -> 0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(again == got.select("doc_id").as[Long].collect().toSet)
  }

  test("temperature mix flattens the head, smallest stratum keeps all") {
    // 900 en / 100 de: α=0.5 → weights 30/10, budget = min(n/√n) =
    // √100 = 10 → rates en = 10·30/900 = 1/3, de = 10·10/100 = 1
    val docs = ((1 to 900).map(i => (i.toLong, "en")) ++
      (1 to 100).map(i => (5000L + i, "de"))).toDF("doc_id", "lang")
    val got = Sampling.temperatureMix(docs, "doc_id", "lang", alpha = 0.5)
    val byLang = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 100, "smallest stratum keeps everything")
    assert(byLang("en") > 240 && byLang("en") < 360, s"en=${byLang("en")}")
    // layout-independent determinism
    val again = Sampling.temperatureMix(docs.repartition(5), "doc_id", "lang")
      .select("doc_id").as[Long].collect().toSet
    assert(again == got.select("doc_id").as[Long].collect().toSet)
  }

  test("temperature mix validates alpha") {
    val docs = Seq((1L, "en")).toDF("doc_id", "lang")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "doc_id", "lang", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "doc_id", "lang", alpha = 1.5)
    }
  }

  test("dupWeightedSample: cluster size scales the keep rate, non-keepers drop") {
    val clusters = Seq(
      // cluster 1: 4 members, keeper 1 -> bp = min(10000, 4*3000) = 10000
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      // singleton keepers -> bp 3000
      (10L, 10L, true), (11L, 11L, true), (12L, 12L, true)
    ).toDF("doc_id", "cluster_id", "keep")
    val got = Sampling.dupWeightedSample(clusters, baseRate = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    assert(got.keySet == Set(1L, 10L, 11L, 12L), "only keepers emitted")
    assert(got(1L) == ((4L, 10000L, true)), "saturated bp always keeps")
    got.filterKeys(_ >= 10L).values.foreach { case (cs, bp, _) =>
      assert(cs == 1L && bp == 3000L)
    }
    // layout independence
    val again = Sampling.dupWeightedSample(clusters.repartition(5), 0.3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(again == got.map { case (k, v) => k -> v._3 })
  }

  test("capPerGroup: keeps the cap best rows per group, id tiebreak") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.8), (4L, "a", 0.1),
      (5L, "b", 0.5)
    ).toDF("doc_id", "src", "q")
    val got = Sampling.capPerGroup(docs, "doc_id", "src", "q", cap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
    // group a: 0.9 → rk1; tie at 0.8 broken by doc_id (2 before 3);
    // doc 3 and the 0.1 doc fall out
    assert(got == Map(1L -> 1, 2L -> 2, 5L -> 1))
    intercept[IllegalArgumentException] {
      Sampling.capPerGroup(docs, "doc_id", "src", "q", cap = 0)
    }
  }

  test("dsir: target-vocabulary docs weigh higher than source-only docs") {
    import org.apache.spark.sql.functions.col
    // target (tgt=true) speaks {alpha beta}, the rest speak {noise junk}
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "beta alpha beta alpha", true),
      (3L, "noise junk noise junk", false),
      (4L, "junk noise junk noise", false),
      (5L, "alpha beta beta alpha", false), // target-LIKE but not labeled
      (6L, "", false)
    ).toDF("doc_id", "text", "is_tgt")
    val w = Sampling.dsirWeights(docs, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w.size == 6, "every input doc is weighted")
    assert(w(6L) == (0L, 0.0), "tokenless doc weighs 0")
    // doc 5 uses the target vocabulary → importance weight ABOVE the
    // source-only docs (this is the DSIR selling point: it upsamples
    // unlabeled data that LOOKS like the target)
    assert(w(5L)._2 > w(3L)._2 && w(5L)._2 > w(4L)._2, s"got $w")
    assert(w(1L)._2 > w(3L)._2)
    // token counts ride along
    assert(w(1L)._1 == 4L && w(5L)._1 == 4L)
  }

  test("dsir: layout-independent (repartition does not change weights)") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "alpha beta gamma", true), (2L, "gamma delta", false),
      (3L, "alpha alpha", false), (4L, "delta beta", true)
    ).toDF("doc_id", "text", "is_tgt")
    val a = Sampling.dsirWeights(docs, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = Sampling.dsirWeights(docs.repartition(7), "doc_id", "text",
        col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("leakageSafeSplit: clustered docs share a split, proportions " +
    "track the buckets, and assignment is layout-independent") {
    import spark.implicits._
    // 600 docs: 0..99 pair up into 50 two-doc clusters, rest singleton
    val docs = (0L until 600L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val clusters = (0L until 600L)
      .map(i => (i, if (i < 100) i / 2 * 2 else i)).toDF("doc_id", "cluster_id")
    val split = Sampling.leakageSafeSplit(docs, "doc_id", clusters)
    val byDoc = split.select("doc_id", "cluster_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(byDoc.length == 600)
    // no cluster straddles splits — the leakage guarantee
    byDoc.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $c straddles")
    }
    // proportions near 8/1/1 (hash noise allowed)
    val counts = byDoc.groupBy(_._3).view.mapValues(_.length).toMap
    assert(counts("train") > 420 && counts("train") < 540, s"$counts")
    assert(counts.getOrElse("val", 0) > 20 && counts.getOrElse("test", 0) > 20)
    // layout independence
    val again = Sampling.leakageSafeSplit(docs.repartition(7), "doc_id",
        clusters.repartition(5))
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(byDoc.forall { case (d, _, s) => again(d) == s })
  }

  test("leakageSafeSplit rejects bucket misconfiguration") {
    import spark.implicits._
    val d = Seq((1L, "t")).toDF("doc_id", "text")
    val c = Seq((1L, 1L)).toDF("doc_id", "cluster_id")
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(d, "doc_id", c, trainBuckets = 9,
        valBuckets = 1)
    }
  }

  test("doremi weights: closed-form two-domain case") {
    val d = Seq((1L, "A"), (2L, "B")).toDF("doc_id", "source")
    val bits = Seq((1L, 100L, 2.0), (2L, 100L, 3.0))
      .toDF("doc_id", "n_tok", "bpt")
    val w = Sampling.doremiWeights(d, bits, "doc_id", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    // equal shares, excess(B) = 1 bit → w_B/w_A = e
    assert(w("A").getAs[Double]("excess_bits") == 0.0)
    assert(w("B").getAs[Double]("excess_bits") == 1.0)
    assert(w("A").getAs[Double]("base_share") == 0.5)
    // closed form: w_A = 1/(1+e), w_B = e/(1+e), portable-rounded
    assert(w("A").getAs[Double]("weight") == 0.2689)
    assert(w("B").getAs[Double]("weight") == 0.7311)
  }

  test("doremi weights: token-weighted loss, zero-token docs ignored") {
    val d = Seq((1L, "A"), (3L, "A"), (2L, "B"), (4L, "B"))
      .toDF("doc_id", "source")
    val bits = Seq((1L, 50L, 2.0), (3L, 150L, 4.0), (2L, 100L, 3.0),
      (4L, 0L, 0.0)).toDF("doc_id", "n_tok", "bpt")
    val w = Sampling.doremiWeights(d, bits, "doc_id", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    // A: (50·2 + 150·4)/200 = 3.5 bits; B unaffected by the empty doc
    assert(w("A").getAs[Double]("bits_per_token") == 3.5)
    assert(w("B").getAs[Double]("bits_per_token") == 3.0)
    assert(w("A").getAs[Long]("n_tokens") == 200L)
    assert(w("B").getAs[Long]("n_tokens") == 100L)
    // B is the easiest domain → excess 0; weights sum to 1 post-round
    assert(w("B").getAs[Double]("excess_bits") == 0.0)
    val sum = w.values.map(_.getAs[Double]("weight")).sum
    assert(math.abs(sum - 1.0) < 2e-4)
    // harder domain ends above its base share
    assert(w("A").getAs[Double]("weight") >
      w("A").getAs[Double]("base_share"))
  }

  test("tokenBudget: class-granular greedy cut, cross-bucket prefix, " +
    "NULL quality never admitted") {
    // buckets: 0.9 → 9; 0.85 and 0.8 → 8 (0.8*10 floats just ABOVE 8);
    // 0.3 → 2 (0.3*10 floats just BELOW 3) — the floor-of-float cases
    // the oracle must agree on
    val d = Seq(
      (1L, "a", Some(0.9), 40L), (2L, "a", Some(0.9), 10L),
      (3L, "b", Some(0.85), 30L), (4L, "a", Some(0.8), 25L),
      (5L, "b", Some(0.3), 100L), (6L, "c", None: Option[Double], 100L))
      .toDF("doc_id", "source", "quality", "n_tok")
    // total 305 tokens (NULL-quality doc counts toward the corpus),
    // budget 305*2 div 5 = 122: classes desc 0.9(50) 0.85(cum 80)
    // 0.8(cum 105) all fit; 0.3 (cum 205) overflows and is dropped
    // whole; the NULL class is never admitted
    val got = Sampling.tokenBudget(d, "doc_id", "source", "quality",
        "n_tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 3L, 75L), ("b", 1L, 30L)))
    // tighter budget (1/5 = 61 tokens): only the 0.9 class fits whole
    // (0.85 would reach 80) — the boundary class drops entirely even
    // though 11 of its tokens would still fit
    val tight = Sampling.tokenBudget(d, "doc_id", "source", "quality",
        "n_tok", num = 1, den = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tight == Seq(("a", 2L, 50L)))
    // layout independence: the two-level prefix must not depend on
    // partitioning
    val got12 = Sampling.tokenBudget(d.repartition(12), "doc_id",
        "source", "quality", "n_tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got12 == got)
  }

  test("essReport: even weights give ESS = n; one dominant weight " +
    "collapses ESS toward 1") {
    val spark2 = spark
    import spark2.implicits._
    val even = Seq(("s", 0.0), ("s", 0.0), ("s", 0.0), ("s", 0.0))
      .toDF("source", "logw")
    val e = Sampling.essReport(even, "source", "logw").head()
    assert(e.getAs[Long]("n_docs") == 4L)
    assert(e.getAs[Double]("ess") == 4.0)
    assert(e.getAs[Double]("ess_ratio") == 1.0)
    val skewed = Seq(("s", 0.0), ("s", -20.0), ("s", -20.0))
      .toDF("source", "logw")
    val k = Sampling.essReport(skewed, "source", "logw").head()
    assert(math.abs(k.getAs[Double]("ess") - 1.0) < 1e-3,
      k.getAs[Double]("ess").toString)
  }

  test("essReport is shift-invariant (only relative weights matter) " +
    "and layout-independent") {
    val spark2 = spark
    import spark2.implicits._
    val base = (0 until 50).map(i => ("s", (i % 7) * 0.1))
    val a = Sampling.essReport(base.toDF("source", "logw"),
      "source", "logw").head().toSeq
    val shifted = base.map { case (s, w) => (s, w + 123.0) }
    val b = Sampling.essReport(shifted.toDF("source", "logw"),
      "source", "logw").head().toSeq
    assert(a == b)
    val c = Sampling.essReport(base.toDF("source", "logw").repartition(7),
      "source", "logw").head().toSeq
    assert(a == c)
  }

  test("quotaAllocate: quotas sum EXACTLY to the budget and largest " +
    "remainders win the leftover seats") {
    val spark2 = spark
    import spark2.implicits._
    // sizes 5, 3, 2 over total 7: exact shares 3.5, 2.1, 1.4 ->
    // bases 3, 2, 1 (sum 6), one seat left -> largest remainder .5 = a
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("source")
    val got = Sampling.quotaAllocate(df, "source", total = 7L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("base"), r.getAs[Long]("extra"),
          r.getAs[Long]("quota"))).toMap
    assert(got("a") == ((3L, 1L, 4L)))
    assert(got("b") == ((2L, 0L, 2L)))
    assert(got("c") == ((1L, 0L, 1L)))
    assert(got.values.map(_._3).sum == 7L)
  }

  test("quotaAllocate: remainder ties break on group name; " +
    "layout-independent") {
    val spark2 = spark
    import spark2.implicits._
    // equal groups, odd budget: one seat to the lexicographically
    // first group
    val df = (Seq.fill(4)("x") ++ Seq.fill(4)("y")).toDF("source")
    val got = Sampling.quotaAllocate(df, "source", total = 5L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    assert(got("x") == 3L && got("y") == 2L)
    val again = Sampling.quotaAllocate(df.repartition(7), "source", 5L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    assert(got == again)
  }

  test("reservoirPerGroup: k per group, replayable, layout-independent, " +
    "salt changes the draw") {
    val df = (1 to 60).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val s1 = Sampling.reservoirPerGroup(df, "id", "grp", k = 4)
      .collect().map(r => (r.getString(1), r.getLong(0))).sorted
    assert(s1.count(_._1 == "a") == 4 && s1.count(_._1 == "b") == 4)
    val s2 = Sampling.reservoirPerGroup(df.repartition(7), "id", "grp",
      k = 4).collect().map(r => (r.getString(1), r.getLong(0))).sorted
    assert(s1.sameElements(s2), "fixed salt must replay identically")
    val s3 = Sampling.reservoirPerGroup(df, "id", "grp", k = 4,
      salt = "v2").collect()
      .map(r => (r.getString(1), r.getLong(0))).sorted
    assert(!s1.sameElements(s3), "a new salt must redraw")
  }

  test("negativeSamplingTable: count^0.75 flattens shares toward the " +
    "tail and the full-vocab shares sum to ~1") {
    val docs = Seq((1L, Seq.fill(81)("big").mkString(" ") + " small"))
      .toDF("id", "text")
    val got = Sampling.negativeSamplingTable(docs, "text", n = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // raw shares would be 81/82 vs 1/82; ^0.75 gives 27/28 vs 1/28
    assert(math.abs(got("big") / got("small") - 27.0) < 0.01)
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
  }

  test("unimaxAllocate: waterfill caps the small source, splits the " +
    "remainder evenly with deterministic leftover, sums to budget") {
    // tokens: a=2, b=10, c=10; caps at E=2: 4/20/20; budget = 22·9/5 = 39
    val docs = Seq(("a", "t1 t2"), ("b", (1 to 10).map("w" + _).mkString(" ")),
      ("c", (1 to 10).map("v" + _).mkString(" ")))
      .toDF("source", "text")
    val got = Sampling.unimaxAllocate(docs, "source", "text",
      epochs = 2, budgetNum = 9L, budgetDen = 5L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("cap_tokens"), r.getAs[Long]("alloc_tokens"),
          r.getAs[Double]("epochs_used"))).toMap
    assert(got("a") == ((4L, 4L, 2.0)), "smallest source hits the epoch cap")
    // remainder 35 over two uncapped sources: 18 (leftover to the
    // first in (cap, source) order) and 17
    assert(got("b") == ((20L, 18L, 1.8)))
    assert(got("c") == ((20L, 17L, 1.7)))
    assert(got.values.map(_._2).sum == 39L, "allocations exhaust the budget")
  }

  test("unimaxAllocate: all-capped when the budget exceeds every cap; " +
    "none capped under a tight budget; layout-independent") {
    val docs = Seq(("a", "t1 t2"), ("b", "w1 w2 w3 w4"))
      .toDF("source", "text")
    // budget = 6·100 = 600 ≥ Σcaps = 12: everyone runs E epochs
    val loose = Sampling.unimaxAllocate(docs, "source", "text",
      epochs = 2, budgetNum = 100L, budgetDen = 1L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc_tokens")).toMap
    assert(loose == Map("a" -> 4L, "b" -> 8L))
    // budget = 6·1/2 = 3 < 2·min cap: nobody capped, 2/1 split
    val tight = Sampling.unimaxAllocate(docs, "source", "text",
      epochs = 2, budgetNum = 1L, budgetDen = 2L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc_tokens")).toMap
    assert(tight("a") + tight("b") == 3L)
    assert(tight("a") == 2L, "leftover goes to the smaller-cap source")
    val re = Sampling.unimaxAllocate(docs.repartition(5), "source",
      "text", epochs = 2, budgetNum = 1L, budgetDen = 2L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc_tokens")).toMap
    assert(re == tight)
  }

  test("purgedTimeSplit: global quantile cut, embargo rows purged from " +
    "train, groups split against the one shared cut") {
    // g1 occupies buckets 1-5, g2 buckets 6-10 (bucketMs=1 -> the time
    // IS the bucket); k = ceil(10*4/5) = 8 -> cut bucket 8
    val rows = ((1 to 5).map(b => ("g1", b.toLong)) ++
      (6 to 10).map(b => ("g2", b.toLong))).toDF("grp", "ms")
    val got = Sampling.purgedTimeSplit(rows, "ms", "grp",
      bucketMs = 1L, embargoBuckets = 1L).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_train"), r.getAs[Long]("n_purged"),
          r.getAs[Long]("n_test"), r.getAs[Long]("cut_bucket")))).toMap
    assert(got("g1") == ((5L, 0L, 0L, 8L)), "early group is all train")
    // g2: 6,7 train; 8 purged (inside the 1-bucket embargo); 9,10 test
    assert(got("g2") == ((2L, 1L, 2L, 8L)))
    intercept[IllegalArgumentException] {
      Sampling.purgedTimeSplit(rows, "ms", "grp", bucketMs = 1L,
        embargoBuckets = 1L, quantNum = 5, quantDen = 5)
    }
  }

  test("neymanAllocate: variance-proportional split, zero-variance " +
    "stratum gets nothing, remainder to largest fractional part, " +
    "all-constant corpus falls back to proportional") {
    // sd: hi {0,10}x5 -> 5.0; mid {4,6}x5 -> 1.0; lo constant -> 0.0
    val rows = ((1 to 5).flatMap(_ => Seq(("hi", 0L), ("hi", 10L))) ++
      (1 to 5).flatMap(_ => Seq(("mid", 4L), ("mid", 6L))) ++
      (1 to 10).map(_ => ("lo", 5L))).toDF("src", "v")
    def run(total: Long) = Sampling.neymanAllocate(rows, "src", "v",
      total).collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("sd"), r.getAs[Long]("alloc")))).toMap
    // weights 50/10/0 -> 12 splits exactly 10/2/0
    val a = run(12L)
    assert(a("hi") == ((5.0, 10L)))
    assert(a("mid") == ((1.0, 2L)))
    assert(a("lo") == ((0.0, 0L)))
    // 13: bases 10/2/0, leftover 1 rides the largest remainder (hi)
    val b = run(13L)
    assert(b("hi")._2 == 11L && b("mid")._2 == 2L && b("lo")._2 == 0L)
    // all-constant strata: weights all 0 -> proportional by count
    val const = ((1 to 4).map(_ => ("a", 7L)) ++
      (1 to 6).map(_ => ("b", 3L))).toDF("src", "v")
    val c = Sampling.neymanAllocate(const, "src", "v", 5L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(c == Map("a" -> 2L, "b" -> 3L))
  }

  test("bootstrapCi: degenerate group collapses to a zero-width CI at " +
    "the mean; spread group brackets it; replayable per salt") {
    // "flat": 100 identical values -> every replicate mean is 0.7
    // exactly; "mix": alternating 0.4/0.6 around mean 0.5
    val rows = ((1 to 100).map(i => (i.toLong, "flat", 0.7)) ++
      (1 to 100).map(i => (200L + i, "mix",
        if (i % 2 == 0) 0.4 else 0.6))).toDF("id", "grp", "p")
    val got = Sampling.bootstrapCi(rows, "id", "grp", "p")
      .collect().map(r => r.getString(0) -> r).toMap
    val flat = got("flat")
    assert(flat.getAs[Long]("b_reps") == 20L)
    assert(flat.getAs[Double]("mean") == 0.7)
    assert(flat.getAs[Double]("ci_lo") == 0.7)
    assert(flat.getAs[Double]("ci_hi") == 0.7)
    val mix = got("mix")
    assert(mix.getAs[Double]("mean") == 0.5)
    assert(mix.getAs[Double]("ci_lo") <= 0.5)
    assert(mix.getAs[Double]("ci_hi") >= 0.5)
    assert(mix.getAs[Double]("ci_lo") < mix.getAs[Double]("ci_hi"),
      "a spread group must have CI width")
    // replayable + layout-independent; a fresh salt redraws
    val re = Sampling.bootstrapCi(rows.repartition(7), "id", "grp", "p")
      .collect().map(_.toSeq).toSeq
    assert(re == got.toSeq.sortBy(_._1).map(_._2.toSeq))
    val other = Sampling.bootstrapCi(rows, "id", "grp", "p",
      salt = "other").collect().map(r => r.getString(0) -> r).toMap
    assert(other("mix").getAs[Double]("ci_lo") !=
      mix.getAs[Double]("ci_lo") ||
      other("mix").getAs[Double]("ci_hi") !=
      mix.getAs[Double]("ci_hi"), "fresh salt must redraw")
  }

  test("purgedTimeSplit: a top-heavy quantile (k=n at 9/10 over ties) " +
    "still yields a nonempty test side only past the cut bucket") {
    // all rows share one bucket: cut = that bucket, everything is
    // purged-or-train, test empty — the degenerate single-bucket case
    val rows = (1 to 10).map(i => ("g", 5L)).toDF("grp", "ms")
    val got = Sampling.purgedTimeSplit(rows, "ms", "grp",
      bucketMs = 1L, embargoBuckets = 0L).head()
    assert(got.getAs[Long]("n_train") == 10L)
    assert(got.getAs[Long]("n_purged") == 0L)
    assert(got.getAs[Long]("n_test") == 0L)
    assert(got.getAs[Long]("cut_bucket") == 5L)
  }

  test("ringRebalance: growing the ring only moves keys TO the new " +
    "shard, preserves every key, and moves roughly 1/(n+1) of them") {
    val docs = (1L to 2000L).map(i => Tuple1(i)).toDF("doc_id")
    val got = Sampling.ringRebalance(docs, "doc_id", 8, 9).collect()
    assert(got.map(_.getLong(2)).sum == 2000L, "every key assigned once")
    // consistent hashing's contract: a key either stays or lands on
    // the NEW shard — old→other-old moves cannot happen
    got.filter(r => r.getInt(0) != r.getInt(1))
      .foreach(r => assert(r.getInt(1) == 8,
        s"moved key landed on old shard ${r.getInt(1)}"))
    val moved = got.filter(r => r.getInt(0) != r.getInt(1))
      .map(_.getLong(2)).sum.toDouble / 2000.0
    assert(moved > 0.02 && moved < 0.35,
      s"expected ~1/9 of keys to move, got $moved")
  }

  test("ringRebalance: identical before/after rings move nothing") {
    val docs = (1L to 300L).map(i => Tuple1(i)).toDF("doc_id")
    val got = Sampling.ringRebalance(docs, "doc_id", 8, 8).collect()
    assert(got.forall(r => r.getInt(0) == r.getInt(1)))
    assert(got.map(_.getLong(2)).sum == 300L)
  }

  test("RingAssign: exact hit takes that vnode, a key past the last " +
    "vnode wraps to the ring start, and lookup matches a linear scan") {
    import graft.plans.RingAssign
    val pos = Array(10L, 20L, 300L, 4000L)
    val sh = Array(3, 1, 2, 0)
    def linear(k: Long): Int =
      pos.indices.find(i => pos(i) >= k).map(sh).getOrElse(sh(0))
    assert(RingAssign.lookup(20L, pos, sh) == 1, "exact hit IS the successor")
    assert(RingAssign.lookup(4001L, pos, sh) == 3, "past the end wraps")
    assert(RingAssign.lookup(Long.MinValue, pos, sh) == 3)
    val probes = Seq(0L, 9L, 10L, 11L, 19L, 21L, 299L, 301L, 3999L,
      4000L, 4001L, Long.MaxValue)
    probes.foreach(k =>
      assert(RingAssign.lookup(k, pos, sh) == linear(k), s"key $k"))
  }
}
