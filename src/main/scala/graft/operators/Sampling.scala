package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic sampling for dataset curation — the step between "dedup
  * found the keepers" and "ship the training mix".
  *
  * `df.sample()` is seed-dependent per partition LAYOUT (same seed,
  * different file split → different rows), which breaks replayability
  * and any cross-engine check. Hash-gating on a stable id fixes both:
  * a row is kept iff md5(salt:id) mod 10000 < rate·10000 — the same
  * decision on any engine, any partitioning, any day. This is also the
  * 100 TB shape: a narrow codegen'd filter at scan time (no shuffle, no
  * state, pushdown-friendly), where true reservoir sampling would need
  * a global pass.
  *
  * Stratified rates let the curation mix differ per stratum (e.g.
  * keep 40% of `en`, 10% of everything else) — the standard lever for
  * rebalancing a multilingual corpus.
  */
object Sampling {

  /** Rate as basis points of the 10000-bucket hash space; every rate —
    * uniform, per-stratum, or default — funnels through this check. */
  private def basisPoints(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    math.round(rate * 10000)
  }

  /** Keep-decision column: md5-hash gate on (salt, id) against a
    * basis-point threshold column. */
  private def hashGate(idCol: Column, thresholdBp: Column,
                       salt: String): Column =
    TextFunctions.md5Hash60(concat_ws(":", lit(salt), idCol.cast("string"))) %
      lit(10000L) < thresholdBp

  /** Uniform deterministic sample at `rate`. */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double,
                          salt: String = "sample"): DataFrame =
    df.filter(hashGate(col(idCol), lit(basisPoints(rate)), salt))

  /** Stratified deterministic sample: per-stratum rates (fallback
    * `defaultRate` for unlisted strata; every rate validated). One
    * codegen'd CASE + hash filter — no shuffle, no per-stratum pass. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "sample"): DataFrame = {
    val rateCol = rates.foldLeft(lit(basisPoints(defaultRate))) {
      case (tail, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(basisPoints(r))).otherwise(tail)
    }
    df.filter(hashGate(col(idCol), rateCol, salt))
  }

  /** Rebalance the corpus toward a TARGET MIX (the domain/language
    * reweighting step of a training-data pipeline): given target
    * proportions per stratum, derive the per-stratum acceptance rates
    * of the LARGEST corpus that satisfies the mix exactly —
    * budget B = minₛ(nₛ/pₛ), rateₛ = B·pₛ/nₛ (the binding stratum keeps
    * everything, the rest downsample) — then apply the deterministic
    * hash gate. Strata absent from `targetMix` are dropped (rate 0);
    * target strata absent from the corpus are ignored for the budget.
    *
    * Scale shape: one tiny groupBy-count collect (O(#strata) driver
    * rows — the k-means-centroid pattern) to derive rates, then the
    * same scan-time codegen filter as [[stratifiedSample]]. Fully
    * deterministic: same corpus + same targets → same rows, any
    * engine, any partitioning. */
  def rebalanceMix(df: DataFrame, idCol: String, strataCol: String,
                   targetMix: Map[String, Double],
                   salt: String = "mix"): DataFrame = {
    require(targetMix.nonEmpty && targetMix.values.forall(_ > 0.0),
      "target mix needs positive proportions")
    // null strata can't be targeted (stratifiedSample's CASE never
    // matches null) — drop the null group instead of NPE-ing on it
    val counts = df.groupBy(strataCol).count().collect()
      .filter(!_.isNullAt(0))
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val present = targetMix.filter { case (s, _) => counts.contains(s) }
    require(present.nonEmpty,
      s"no target stratum present in corpus (targets: ${targetMix.keys})")
    // B and the rates are plain IEEE double ops in a fixed order —
    // (n/p) min, then B·p/n — so an oracle re-deriving them in SQL
    // lands on identical basis points
    val budget = present.map { case (s, p) => counts(s).toDouble / p }.min
    // clamp: the binding stratum's rate is mathematically exactly 1 but
    // FP can land an ulp above (oracles mirror with least(x, 1.0))
    val rates = present.map { case (s, p) =>
      s -> math.min(budget * p / counts(s).toDouble, 1.0)
    }
    stratifiedSample(df, idCol, strataCol, rates, defaultRate = 0.0, salt)
  }

  /** Temperature-based mixture sampling — the multilingual rebalancing
    * scheme of mBERT/XLM-R/mT5 (Devlin et al. 2019 app. A;
    * Conneau et al. 2020 §3): sample stratum s proportionally to
    * nₛ^α, flattening the head without inverting the distribution.
    * This is [[rebalanceMix]] with the target mix DERIVED from the
    * corpus itself (pₛ ∝ nₛ^α) instead of hand-picked: the smallest
    * stratum keeps everything (a filter cannot upsample) and larger
    * strata downsample by (n_min-derived budget)·nₛ^(α−1).
    *
    * α = 0.5 (the default) computes weights with `sqrt`, which IEEE 754
    * requires to be CORRECTLY ROUNDED — so the derived basis points are
    * bit-identical on any engine and the hash gate stays cross-engine
    * reproducible. Other α use `pow`, which carries no such guarantee
    * (1-ulp differences between libm implementations could flip a
    * boundary row) — fine for production, not for a hash-compared
    * oracle. Same scale shape as rebalanceMix: one O(#strata) count
    * collect, then a scan-time codegen filter. */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
                     alpha: Double = 0.5, salt: String = "temp"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(strataCol).count().collect()
      .filter(!_.isNullAt(0))
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    require(counts.nonEmpty, "corpus has no non-null strata")
    def powA(n: Double): Double =
      if (alpha == 0.5) math.sqrt(n) else math.pow(n, alpha)
    val w = counts.map { case (s, n) => s -> powA(n.toDouble) }
    // same op order as the SQL mirror: budget = min(n/w), rate = B·w/n
    val budget = counts.map { case (s, n) => n.toDouble / w(s) }.min
    val rates = counts.map { case (s, n) =>
      s -> math.min(budget * w(s) / n.toDouble, 1.0)
    }
    stratifiedSample(df, idCol, strataCol, rates, defaultRate = 0.0, salt)
  }

  /** Per-group document cap — the C4/CommonCrawl "at most N pages per
    * domain" rule, quality-ranked: within each group keep the `cap`
    * best rows by `rankCol` (desc), deterministic id tiebreak. The
    * rank-based complement of the hash-gate samplers above: a cap
    * bounds a single runaway domain, a rate cannot.
    *
    * Scale shape: ONE window shuffle on the group key. A mega-domain is
    * the classic window skew — at 100 TB pre-filter with an
    * approximate per-group quantile or salt the heavy groups
    * ([[Salting]]) before the exact rank. Output: input columns +
    * rk (1-based rank within group). */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  rankCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    // rk is part of the output contract, so a pre-existing rk column
    // would be silently overwritten — refuse instead
    require(!df.columns.contains("rk"),
      "input already has an 'rk' column; rename it before capPerGroup " +
        "(rk is capPerGroup's output rank column)")
    val w = Window.partitionBy(groupCol)
      .orderBy(col(rankCol).desc, col(idCol).asc)
    df.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= cap)
  }

  /** Uniform k-per-group sample, replayable: rank every row inside its
    * group by a salted id hash and keep the first `k` — the
    * distributed, deterministic stand-in for per-group reservoir
    * sampling (same marginal: each group member equally likely under a
    * random salt; fixed salt ⇒ the SAME sample on every replay, layout
    * be damned — the property an audited pipeline needs and a true
    * streaming reservoir can't give). Complements [[capPerGroup]]
    * (quality-ranked cap) with the unbiased-draw variant.
    *
    * Scale shape: one window shuffle on the group key; skewed groups
    * take the [[Salting.saltedTopK]] route with these same keys. */
  def reservoirPerGroup(df: DataFrame, idCol: String, groupCol: String,
                        k: Int, salt: String = "v1"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val key = TextFunctions.md5Hash60(concat(lit(s"res:$salt:"),
      col(idCol).cast("string")))
    val w = Window.partitionBy(groupCol)
      .orderBy(key.asc, col(idCol).asc)
    df.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
  }

  /** word2vec-style negative-sampling table: the top `n` vocabulary
    * terms with their unigram count and their draw share under the
    * classic count^0.75 flattening (Mikolov et al. — raw frequency
    * over-draws stopwords, uniform under-draws them). x^0.75 is
    * computed as sqrt(x)·sqrt(sqrt(x)) — two IEEE-correctly-rounded
    * sqrts and one multiply, bit-identical on any engine (the
    * temperatureMix α=0.5 precedent, squared) — then quantized to
    * exact ×10⁶ longs so the normalizer is an order-free integer sum
    * over the WHOLE vocabulary, not just the reported rows.
    * Output: (term, cnt, share) for the top n by (cnt desc, term). */
  def negativeSamplingTable(df: DataFrame, textCol: String, n: Int = 100,
                            roundTo: Int = 6): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val tc = df.select(
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val wq = floor(sqrt(col("cnt").cast("double")) *
      sqrt(sqrt(col("cnt").cast("double"))) * lit(1e6) + lit(0.5))
      .cast("long")
    val weighted = tc.withColumn("wq", wq)
    val z = broadcast(weighted.agg(sum(col("wq")).as("z")))
    Ranked.rankBounded(
      weighted.crossJoin(z)
        .select(col("term"), col("cnt"),
          TextFunctions.portableRound(
            col("wq").cast("double") / col("z").cast("double"),
            roundTo).as("share")),
      n, Seq(col("cnt").desc, col("term").asc))
  }

  /** Duplication-weighted sampling over resolved dedup clusters: each
    * cluster's keeper survives with probability min(1, rate·size) —
    * dedup deletes the copies, but HOW OFTEN something was copied is
    * signal (mirrored pages are popular or templated), and discarding
    * it entirely biases the mix toward one-off pages. Standard practice
    * when dedup meets mixture design (cf. the dedup discussion in Lee
    * et al. 2022). Expects [[Dedup.resolveClusters]] output
    * (doc_id, cluster_id, keep).
    *
    * Scale shape: one cluster-keyed count + a broadcastable join back
    * to the keepers, then the usual scan-time hash gate — integer
    * basis points throughout, deterministic on any engine/layout. */
  def dupWeightedSample(clusters: DataFrame, baseRate: Double,
                        salt: String = "wsamp"): DataFrame = {
    val sizes = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("csize"))
    clusters.filter(col("keep"))
      .join(sizes, Seq("cluster_id"))
      .withColumn("bp",
        least(lit(10000L), lit(basisPoints(baseRate)) * col("csize")))
      .select(col("doc_id"), col("csize"), col("bp"),
        hashGate(col("doc_id"), col("bp"), salt).as("kept"))
  }

  /** DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    * per-document log importance weight log p_target(d)/p_source(d)
    * under hashed-unigram bag-of-words models — the principled way to
    * upsample web data that "looks like" a high-quality target corpus
    * without training a classifier.
    *
    * Features are md5-hashed unigrams in `buckets` buckets; both
    * distributions are add-1 smoothed over the bucket space. The target
    * model trains on the `targetPred` rows, the source model on the
    * whole corpus, BOTH in one aggregation pass (conditional agg).
    *
    * Cross-engine determinism of the float sum: the per-doc weight
    * folds over the doc's bucket list SORTED BY BUCKET (Spark
    * `aggregate` and DuckDB `list_reduce` are both sequential left
    * folds), so addition order is fixed — never an aggregation-order
    * float sum. Totals enter as exact integers; the result is
    * portable-rounded.
    *
    * Scale shape: one explode → two hash aggregations (per-doc-bucket
    * and global-bucket) + one O(1) totals job; the global table is ≤
    * `buckets` rows → broadcast join; per-doc state is the doc's
    * DISTINCT buckets (≤ buckets), not its tokens. Output: (doc_id,
    * n_tok, logw) for every input row; tokenless docs weigh 0. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, buckets: Int = 1024,
                  roundTo: Int = 4): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), targetPred.as("tgt"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .select(col("doc_id"), col("tgt"),
        (TextFunctions.md5Hash60(col("term")) % buckets).as("h"))
    val tot = toks.agg(count(lit(1)),
      sum(when(col("tgt"), 1L).otherwise(0L))).head()
    val (ts, tt) =
      if (tot.isNullAt(1)) (0L, 0L) else (tot.getLong(0), tot.getLong(1))
    val tsB = (ts + buckets).toDouble
    val ttB = (tt + buckets).toDouble
    val g = toks.groupBy("h").agg(
      count(lit(1)).as("cs"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
    val dc = toks.groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
    val per = dc.join(broadcast(g), Seq("h"))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_tok"),
        array_sort(collect_list(struct(col("h"), col("c"),
          col("ct"), col("cs")))).as("arr"))
      .select(col("doc_id"), col("n_tok"),
        TextFunctions.portableRound(
          aggregate(col("arr"), lit(0.0), (acc, s) =>
            acc + s.getField("c").cast("double") *
              (log((s.getField("ct").cast("double") + lit(1.0)) / lit(ttB)) -
               log((s.getField("cs").cast("double") + lit(1.0)) / lit(tsB)))),
          roundTo).as("logw"))
    df.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("logw"), lit(0.0)).as("logw"))
  }

  /** DoReMi-style domain mixture reweighting (Xie et al. 2023,
    * "Doremi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining"), reference-free variant: domains whose text is
    * harder under the corpus unigram model get upweighted relative to
    * their token share by the multiplicative-weights rule
    * w_s ∝ share_s · exp(η · excess_s), where excess_s is the domain's
    * token-weighted bits-per-token above the easiest domain's. The
    * per-doc proxy loss arrives as an input (— [[CorpusStats
    * .unigramBits]] output — ) so the caller can swap in any scorer
    * (trigram LM, classifier NLL) without touching the update rule.
    *
    * Scale shape: one (doc → source) join + a per-source aggregation,
    * executed exactly once — the ≤|sources|-row result is localized so
    * the three downstream consumers (min/total scalars, normalizer
    * fold, final projection) never replay the corpus-wide proxy-loss
    * lineage. Everything after the localization is per-SOURCE rows (a
    * handful), including the normalizer, which folds over a
    * source-sorted list so the sum order is never engine-chosen
    * ([[dsirWeights]]' recipe). Driver state: ≤|sources| rows. */
  def doremiWeights(docs: DataFrame, perDocBits: DataFrame, idCol: String,
                    sourceCol: String, eta: Double = 1.0,
                    roundTo: Int = 4): DataFrame = {
    val slPlan = perDocBits.filter(col("n_tok") > 0)
      .join(docs.select(col(idCol).as("doc_id"),
        col(sourceCol).as("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(sum(col("n_tok")).cast("long").as("n_tokens"),
        TextFunctions.portableRound(
          sum(col("bpt") * col("n_tok").cast("double")) /
            sum(col("n_tok")).cast("double"), roundTo)
          .as("bits_per_token"))
    // Run the corpus-wide proxy-loss lineage exactly ONCE: the
    // per-source table is ≤|sources| rows, but three separate actions
    // consume it (the min/total scalars, the sorted normalizer fold,
    // the final projection) — left as lazy lineage each would replay
    // the full unigram-LM scan, tripling the corpus cost. Localizing
    // ≤|sources| rows is bounded driver state, the file's invariant.
    val sl = perDocBits.sparkSession.createDataFrame(
      java.util.Arrays.asList(slPlan.collect(): _*), slPlan.schema)
    val mnRow = sl.agg(min(col("bits_per_token")),
      sum(col("n_tokens")).cast("long")).head()
    val minLoss = mnRow.getDouble(0)
    val total = mnRow.getLong(1)
    val u = sl.select(col("source"), col("n_tokens"), col("bits_per_token"),
        (col("bits_per_token") - lit(minLoss)).as("excess"),
        (col("n_tokens").cast("double") / lit(total.toDouble)).as("share"))
      .withColumn("unnorm", col("share") * exp(lit(eta) * col("excess")))
    val z = u.agg(aggregate(
      array_sort(collect_list(struct(col("source").as("s"),
        col("unnorm").as("u")))),
      lit(0.0), (a, x) => a + x.getField("u"))).head().getDouble(0)
    u.select(col("source"), col("n_tokens"), col("bits_per_token"),
      TextFunctions.portableRound(col("excess"), roundTo).as("excess_bits"),
      TextFunctions.portableRound(col("share"), roundTo).as("base_share"),
      TextFunctions.portableRound(col("unnorm") / lit(z), roundTo)
        .as("weight"))
  }

  /** Weighted sampling WITHOUT replacement, one pass, no replay:
    * Efraimidis–Spirakis priority sampling (A-ES, 2006). Each row gets
    * key = −ln(u)/w with u ~ U(0,1] derived from the salted md5 of its
    * id; the k SMALLEST keys are exactly a weight-proportional
    * without-replacement sample — higher weight ⇒ stochastically
    * smaller key.
    *
    * Against the alternatives at 100 TB: rejection sampling replays the
    * scan an unbounded number of times; a global `rand()` sort is
    * nondeterministic AND a full shuffle. This is one scan + a
    * TakeOrderedAndProject (per-partition heaps of k, driver merges
    * k × partitions rows) — and because u is a pure function of the id,
    * the sample is replayable on retries/restarts, the property every
    * other sampler in this file is built around.
    *
    * Weights clamp to ≥ 1 (zero/negative weights would send the key to
    * ±∞). Keys are portable-rounded and ties break by id, so the
    * selected SET is stable across engines up to documented rounding.
    * Output: the k winners with their weight, key, and 1-based rank. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, roundTo: Int = 6): DataFrame = {
    require(k >= 1, "k >= 1")
    val u = (TextFunctions.md5Hash60(concat(lit("prio:"),
      col(idCol).cast("string"))).cast("double") + lit(1.0)) /
      lit(1152921504606846976.0) // 2^60: u in (0, 1]
    val key = TextFunctions.portableRound(
      (lit(0.0) - log(u)) /
        greatest(col(weightCol).cast("double"), lit(1.0)),
      roundTo)
    val top = df.select(col(idCol).as("doc_id"),
        col(weightCol).cast("long").as("weight"), key.as("prio_key"))
      .orderBy(col("prio_key"), col("doc_id"))
      .limit(k)
    // rank window runs over the k survivors only
    top.withColumn("rn", row_number().over(
      Ranked.bounded(col("prio_key"), col("doc_id"))).cast("int"))
  }

  /** Deterministic hash sharding + balance report: assign every row to
    * one of `shards` shards by salted id hash and report each shard's
    * doc/token mass and its skew vs the mean — the pre-write check
    * before laying a corpus out as S files/partitions (hash sharding is
    * the 100 TB default precisely because its imbalance concentrates
    * around 1.0; this is the report that proves it on YOUR corpus).
    *
    * One scan + one `shards`-key aggregation; the mean joins back as a
    * 1-row broadcast. Assignment is a pure function of the id —
    * replayable, layout-independent, and identical to what a writer
    * partitioning by this key would produce. */
  def shardBalance(df: DataFrame, idCol: String, textCol: String,
                   shards: Int, roundTo: Int = 6): DataFrame = {
    require(shards >= 1, "shards >= 1")
    val shard = (TextFunctions.md5Hash60(concat(lit("shard:"),
      col(idCol).cast("string"))) % shards).cast("int")
    val per = df.select(shard.as("shard"),
        TextFunctions.tokenCount(col(textCol)).as("tk"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).cast("long")
        .as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("tot"),
      count(lit(1)).as("ns"))
    per.join(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        TextFunctions.portableRound(
          col("n_tokens").cast("double") * col("ns").cast("double") /
            col("tot").cast("double"), roundTo).as("skew"))
  }

  /** Leakage-safe train/val/test assignment: the split is a pure
    * hash function of the document's NEAR-DUP CLUSTER id, not of the
    * document — so a near-duplicate of a training page can never land
    * in the eval split (the train/test contamination channel that
    * per-doc random splits leave wide open; the reason public corpora
    * dedup BEFORE splitting). `clusters` is [[Dedup.resolveClusters]]'
    * (doc_id, cluster_id) output; singleton docs are their own cluster
    * and split independently.
    *
    * trainBuckets + valBuckets must be < 10; the remainder is test.
    * Determinism: the bucket is md5(salt|cluster_id) mod 10 — stable
    * under any layout, replayable, oracle-reproducible. Scale shape:
    * one broadcast-or-shuffle join docs⋈clusters plus a codegen'd
    * CASE — no window, no global state. */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
                       clusters: DataFrame,
                       trainBuckets: Int = 8, valBuckets: Int = 1,
                       salt: String = "split"): DataFrame = {
    require(trainBuckets >= 1 && valBuckets >= 1 &&
      trainBuckets + valBuckets < 10,
      "need trainBuckets >= 1, valBuckets >= 1, train+val < 10")
    val bucket = TextFunctions.md5Hash60(
      concat(lit(s"$salt|"), col("cluster_id").cast("string"))) % lit(10L)
    docs.join(clusters.select(col("doc_id").as(idCol), col("cluster_id")),
        Seq(idCol))
      .withColumn("split",
        when(bucket < trainBuckets, "train")
          .when(bucket < trainBuckets + valBuckets, "val")
          .otherwise("test"))
  }

  /** Quality-greedy selection under a token budget — the
    * data-constrained-curation step: admit documents from the best
    * quality score downward until `num/den` of the corpus's tokens are
    * spent, then report the per-source composition of what was kept.
    *
    * Granularity is the quality CLASS (the distinct rounded score),
    * not the document: classes are admitted whole, in quality-descending
    * order, and the first class that would overflow the budget is
    * dropped entirely. Class-granular cutoffs keep the whole reduction
    * free of any per-document global ordering — no ranking of the
    * corpus, no running sum over unbounded rows — and make the
    * selection independent of doc_id enumeration order by construction.
    *
    * Scale shape: the only per-document passes are two hash aggregates
    * (class histogram, final per-source rollup) and one broadcast semi
    * join against the kept-class list. The prefix sum over classes runs
    * two-level — a cumsum windowed WITHIN each first-decimal bucket of
    * the score plus a bucket-totals self-join for the cross-bucket
    * prefix — so no single-partition window exists anywhere even though
    * the reduction is a global running total. State is bounded by score
    * cardinality (4-dp scores: ≤ 10⁴ classes, ≤ 11 buckets), the x172
    * histogram-method invariant.
    *
    * NULL scores are never admitted (a doc the scorer could not rate
    * cannot be certified high-quality): the equality semi join is
    * null-rejecting on both engines, which the oracle's `USING (q)`
    * mirrors. Budget arithmetic is integer (`sum·num div den`), so the
    * threshold is the same exact value at any corpus size. */
  /** Data-constrained-scaling dashboard (the Muennighoff et al.
    * question): under a √-temperature mixture (weight_s ∝ √tokens_s —
    * the α = 0.5 point every mixture family here uses), how many
    * compute-epochs of drawing `budget ≈ total corpus tokens` pass
    * before each source's data is exhausted and starts repeating?
    * epochs_s = tokens_s / (w_s · budget); sources under 1.0 repeat
    * WITHIN one epoch — the rows that tell a data team which sources
    * need more collection before upsampling.
    *
    * √ specifically (not pow(·, α)): sqrt is IEEE-correctly-rounded
    * in both engines, library pow is not — a general α needs an
    * engine-identical pow, so the contract fixes the exponent. The
    * normalizer folds in source-sorted order. One token-count scan +
    * one bounded per-source pass. */
  def exhaustionReport(df: DataFrame, sourceCol: String, textCol: String,
                       roundTo: Int = 4): DataFrame = {
    val per = df.select(col(sourceCol).as("source"),
        size(TextFunctions.tokens(lower(col(textCol)))).cast("long")
          .as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("nt"), lit(0L))).as("n_tokens"))
    val z = per
      .agg(sum(col("n_tokens")).as("budget"),
        array_sort(collect_list(struct(col("source"),
          sqrt(col("n_tokens").cast("double")).as("w")))).as("arr"))
      .select(col("budget"),
        aggregate(col("arr"), lit(0.0), (acc, s) =>
          acc + s.getField("w")).as("zz"))
    val w = sqrt(col("n_tokens").cast("double")) / col("zz")
    val drawn = w * col("budget").cast("double")
    per.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        TextFunctions.portableRound(w, roundTo).as("weight"),
        TextFunctions.portableRound(drawn, roundTo).as("tokens_per_epoch"),
        TextFunctions.portableRound(
          when(drawn === lit(0.0), lit(0.0))
            .otherwise(col("n_tokens").cast("double") / drawn), roundTo)
          .as("epochs_to_exhaustion"))
      .orderBy("source")
  }

  /** Largest-remainder quota allocation: split an EXACT `total` (an
    * eval-set budget, an annotation batch) across groups proportional
    * to their sizes — floor quotas first, then the leftover seats go
    * to the largest fractional remainders (group-name tiebreak). The
    * deterministic integer answer to "give me exactly 10,000 docs,
    * source-proportional" that a per-group rate sample can only hit
    * in expectation.
    *
    * ZERO floats: base = total·n div N, remainder = total·n mod N,
    * ranks over the bounded group table ([[Ranked.bounded]] — groups
    * are sources/languages, not documents). Σquota = total exactly,
    * by construction. */
  def quotaAllocate(df: DataFrame, groupCol: String,
                    total: Long): DataFrame = {
    require(total >= 0, "total must be >= 0")
    val counts = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("nn"))
    val based = counts.crossJoin(broadcast(tot))
      .select(col("grp"), col("n_docs"),
        expr(s"(${total}L * n_docs) DIV nn").as("base"),
        expr(s"(${total}L * n_docs) % nn").as("rem"))
    val leftover = based
      .agg((lit(total) - sum(col("base"))).as("leftover"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(
        Ranked.bounded(col("rem").desc, col("grp"))))
      .select(col("grp").as(groupCol), col("n_docs"), col("base"),
        when(col("rk") <= col("leftover"), lit(1L)).otherwise(lit(0L))
          .as("extra"))
      .withColumn("quota", col("base") + col("extra"))
      .orderBy(groupCol)
  }

  /** Effective sample size of per-document importance weights, per
    * group — the standing diagnostic for every weighted-sampling lever
    * this engine ships ([[dsirWeights]], [[doremiWeights]], dup
    * weighting): ESS = (Σw)²/Σw² collapses toward 1 when a few huge
    * weights dominate (the resample would effectively train on a
    * handful of documents), stays near n when weights are even. Input
    * is LOG weights (what dsirWeights emits).
    *
    * Determinism: per-group max-shift (exact on the 1e-4-rounded
    * logw), then w' = exp(logw − max) ∈ (0, 1] quantized to ×10⁸
    * longs so both sums are EXACT integer accumulations (DECIMAL — a
    * ×10⁸ square is ~10¹⁶ per row, the Pca lesson applies to the
    * sum); ESS is scale-invariant so the shift cancels. Two divisions
    * at the end. One groupBy + one join + one groupBy — map-side
    * combined, no windows. */
  def essReport(df: DataFrame, groupCol: String, logwCol: String,
                roundTo: Int = 4): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val mx = df.groupBy(col(groupCol).as("grp"))
      .agg(max(col(logwCol)).as("_m"))
    val vq = df.select(col(groupCol).as("grp"), col(logwCol).as("_lw"))
      .join(broadcast(mx), Seq("grp"))
      .select(col("grp"),
        floor(exp(col("_lw") - col("_m")) * lit(100000000.0) + lit(0.5))
          .cast("long").as("v"))
    val agg = vq.groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("v").cast(dec)).as("s1"),
        sum((col("v") * col("v")).cast(dec)).as("s2"))
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    val ess = when(s2d === lit(0.0), lit(0.0))
      .otherwise(s1d * s1d / s2d)
    agg.select(col("grp").as(groupCol), col("n_docs"),
      TextFunctions.portableRound(ess, roundTo).as("ess"),
      TextFunctions.portableRound(
        ess / col("n_docs").cast("double"), roundTo).as("ess_ratio"))
  }

  def tokenBudget(df: DataFrame, idCol: String, sourceCol: String,
                  qualityCol: String, tokCol: String,
                  num: Int = 2, den: Int = 5): DataFrame = {
    require(num >= 0 && den >= 1, "need num >= 0, den >= 1")
    val d = df.select(col(idCol).as("id"), col(sourceCol).as("src"),
      col(qualityCol).as("q"), col(tokCol).cast("long").as("nt"))
    val cls = d.groupBy("q").agg(sum("nt").as("ct"))
      .withColumn("b", floor(col("q") * 10).cast("int"))
    val inBucket = cls.withColumn("cum_in", sum(col("ct")).over(
      Window.partitionBy("b").orderBy(desc("q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bucketTotals = cls.groupBy("b").agg(sum("ct").as("bt"))
    val above = bucketTotals.as("lo")
      .join(bucketTotals.as("hi"), col("hi.b") > col("lo.b"), "left")
      .groupBy(col("lo.b").as("b"))
      .agg(coalesce(sum(col("hi.bt")), lit(0L)).as("above"))
    val budget = d.agg(
      expr(s"(sum(nt) * $num) div $den").as("budget"))
    val kept = inBucket.join(above, Seq("b"))
      .crossJoin(broadcast(budget))
      .filter(col("cum_in") + col("above") <= col("budget"))
      .select("q")
    d.join(broadcast(kept), Seq("q"), "left_semi")
      .groupBy(col("src").as(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
      .orderBy(sourceCol)
  }

  /** P(X ≤ k) for X ~ Poisson(1), k = 0..4 — the inverse-CDF table
    * [[bootstrapCi]] shares with its oracle SQL (the literals
    * interpolate from THESE doubles, so the two engines compare u
    * against bit-identical constants). Draws are truncated at 5. */
  val PoissonCdf1: Seq[Double] = {
    val e = math.exp(-1.0)
    Seq(e, 2 * e, 2.5 * e, e * 8 / 3, e * 65 / 24)
  }

  /** Poisson-bootstrap confidence interval for a per-group mean — the
    * DISTRIBUTED bootstrap (resampling n rows with replacement needs a
    * global draw; giving each row an independent Poisson(1) replicate
    * weight needs only a scan, and the replicate sizes concentrate at
    * n): B deterministic replicates whose weights derive from a salted
    * hash of (replicate, id) via the shared [[PoissonCdf1]] inverse-CDF
    * table, so the interval is replayable and cross-engine checkable —
    * the same replayable-noise contract as the DP Laplace release
    * (production draws a fresh secret salt per run).
    *
    * Each replicate's mean is one exact-integer ratio quantized to the
    * score grid; the CI endpoints are order statistics (⌈B/40⌉ and
    * ⌈39B/40⌉, a 95% percentile interval) over the ≤B replicate means
    * per group — a bounded window. Cost is the honest bootstrap price:
    * a B× row fan-out, immediately map-side combined to (group,
    * replicate) grain, so the shuffle carries g·B rows, not B corpora.
    *
    * Output per group: (group, n_docs, mean, ci_lo, ci_hi, b_reps). */
  def bootstrapCi(df: DataFrame, idCol: String, groupCol: String,
                  probCol: String, b: Int = 20, salt: String = "v1",
                  roundTo: Int = 4): DataFrame = {
    require(b >= 2, "need at least 2 replicates")
    val sc = df.select(col(groupCol).as("grp"),
      col(idCol).cast("string").as("id"),
      floor(col(probCol) * lit(10000.0) + lit(0.5)).cast("long").as("pq"))
    val exploded = sc.withColumn("bi",
      explode(array((1 to b).map(lit(_)): _*)))
    val u = (TextFunctions.md5Hash60(concat(lit(s"boot:$salt:"),
      col("bi").cast("string"), lit(":"), col("id"))).cast("double") +
      lit(0.5)) / lit(1152921504606846976.0)
    val w = PoissonCdf1.map(c => when(u >= lit(c), 1L).otherwise(0L))
      .reduce(_ + _)
    val rep = exploded.withColumn("w", w)
      .groupBy("grp", "bi")
      .agg(sum(col("w") * col("pq")).as("swp"), sum(col("w")).as("sw"))
      .filter(col("sw") > 0L)
      .withColumn("mq", floor(col("swp").cast("double") /
        col("sw").cast("double") + lit(0.5)).cast("long"))
    val wq = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val ranked = rep
      .withColumn("rn", row_number().over(wq.orderBy(col("mq"), col("bi"))))
      .withColumn("m", count(lit(1)).over(wq))
    val ci = ranked.groupBy("grp").agg(
      max(col("m")).as("b_reps"),
      min(when(col("rn") === expr("(m + 39) DIV 40"), col("mq")))
        .as("loq"),
      min(when(col("rn") === expr("(m * 39 + 39) DIV 40"), col("mq")))
        .as("hiq"))
    val point = sc.groupBy("grp")
      .agg(count(lit(1)).as("n_docs"), sum(col("pq")).as("s1"))
    point.join(ci, Seq("grp"))
      .select(col("grp").as(groupCol), col("n_docs"),
        TextFunctions.portableRound(col("s1").cast("double") /
          (col("n_docs").cast("double") * lit(10000.0)), roundTo)
          .as("mean"),
        TextFunctions.portableRound(
          col("loq").cast("double") / lit(10000.0), roundTo).as("ci_lo"),
        TextFunctions.portableRound(
          col("hiq").cast("double") / lit(10000.0), roundTo).as("ci_hi"),
        col("b_reps"))
      .orderBy(groupCol)
  }

  /** Neyman optimal allocation for stratified sampling (Neyman 1934 —
    * the classical result): sample size per stratum proportional to
    * Nₕ·σₕ, which minimizes the variance of the stratified mean at a
    * fixed total budget. High-variance strata get oversampled relative
    * to [[quotaAllocate]]'s proportional split; a zero-variance
    * stratum needs almost no samples to pin its mean. With population
    * variance σₕ² = (nₕΣx² − (Σx)²)/nₕ², the weight collapses to
    * wₕ = nₕ·σₕ = √(nₕΣx² − (Σx)²) — one square root of an exact
    * integer moment expression (DECIMAL, the Pca lesson).
    *
    * Weights quantize to ×10⁶ longs before the shared normalizer (an
    * order-free DECIMAL sum); integer allocation uses the
    * largest-remainder rule ([[quotaAllocate]]'s), ties on stratum
    * name. If every stratum is constant (all weights 0) allocation
    * falls back to proportional-by-count. Allocations are NOT capped
    * at nₕ: Neyman can assign a small high-variance stratum more than
    * its population (sampling with replacement) — capping would need
    * the iterative redistribution this closed form deliberately
    * avoids, and the report makes the oversample visible instead.
    *
    * Output per stratum: (stratum, n_docs, sd, weight_q, alloc). */
  def neymanAllocate(df: DataFrame, strataCol: String, valueCol: String,
                     total: Long, roundTo: Int = 4): DataFrame = {
    require(total >= 0, "total must be >= 0")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val st = df.select(col(strataCol).as("stratum"),
        col(valueCol).cast("long").as("x"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("s1"),
        sum((col("x") * col("x")).cast(dec)).as("s2"))
    val varn2 = (col("n_docs").cast(dec) * col("s2") -
      col("s1").cast(dec) * col("s1").cast(dec)).cast("double")
    val w = st
      .withColumn("wq",
        floor(sqrt(varn2) * lit(1.0e6) + lit(0.5)).cast("long"))
      .withColumn("sd",
        TextFunctions.portableRound(
          sqrt(varn2) / col("n_docs").cast("double"), roundTo))
    val z = w.agg(sum(col("wq").cast(dec)).as("z"),
      sum(col("n_docs")).as("n_tot"))
    // all-constant fallback: weights become the counts (proportional)
    val based = w.crossJoin(broadcast(z))
      .withColumn("eff_w",
        when(col("z") === lit(0).cast(dec), col("n_docs"))
          .otherwise(col("wq")))
      .withColumn("eff_z",
        when(col("z") === lit(0).cast(dec), col("n_tot").cast(dec))
          .otherwise(col("z")))
      // exact floor division on DECIMALs: subtract the pmod remainder
      // first, so the decimal divide is exact (never a scale-6 round)
      .withColumn("tw", lit(total).cast(dec) * col("eff_w").cast(dec))
      .withColumn("remd", pmod(col("tw"), col("eff_z")))
      .withColumn("base",
        ((col("tw") - col("remd")) / col("eff_z")).cast("long"))
      // rank remainders as exact DECIMALs — a double projection could
      // collapse distinct remainders past 2⁵³ and reorder the leftover
      .withColumn("remn", col("remd"))
    val leftover = based.agg((lit(total) - sum(col("base"))).as("leftover"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(
        Ranked.bounded(col("remn").desc, col("stratum"))))
      .select(col("stratum").as(strataCol), col("n_docs"), col("sd"),
        col("wq").as("weight_q"),
        (col("base") + when(col("rk") <= col("leftover"), lit(1L))
          .otherwise(lit(0L))).as("alloc"))
      .orderBy(strataCol)
  }

  /** Purged time-ordered split with an embargo gap (the leakage-safe
    * split for TEMPORALLY correlated data — de Prado's purged k-fold
    * collapsed to the single train/test split a pretraining-data
    * pipeline uses): the cut lands at the quantNum/quantDen quantile
    * of the time column, rows inside `embargoBuckets` time buckets
    * BEFORE the cut are purged from training (their windows overlap
    * the test period — the near-boundary leak [[leakageSafeSplit]]'s
    * hash split cannot see because it ignores time), and everything
    * after the cut is test.
    *
    * The quantile is an order statistic over TIME BUCKETS (t DIV
    * bucketMs), not raw timestamps: bucket cardinality is bounded by
    * the calendar, so the cumulative-count window never grows with
    * corpus size (the x183 histogram route; raw-timestamp order
    * statistics would not scale). k = ⌈n·quantNum/quantDen⌉ exact
    * integer; the cut is the first bucket whose cumulative count
    * reaches k.
    *
    * Returns one row per group: (group, n_train, n_purged, n_test,
    * cut_bucket). */
  def purgedTimeSplit(df: DataFrame, timeCol: String, groupCol: String,
                      bucketMs: Long, embargoBuckets: Long,
                      quantNum: Int = 4, quantDen: Int = 5): DataFrame = {
    require(bucketMs >= 1, "bucket width must be >= 1")
    require(embargoBuckets >= 0, "embargo must be >= 0")
    require(quantNum >= 1 && quantNum < quantDen,
      "split quantile must be a rational in (0,1)")
    val rows = df.select(col(groupCol).as("grp"),
      expr(s"CAST($timeCol AS BIGINT) DIV ${bucketMs}L").as("b"))
    val per = rows.groupBy("b").agg(count(lit(1)).as("cn"))
    val tot = per.agg(sum(col("cn")).as("n"))
      .withColumn("k",
        expr(s"(n * $quantNum + ${quantDen - 1}) DIV $quantDen"))
    val cut = per
      .withColumn("cum", sum(col("cn")).over(Ranked.bounded(col("b"))))
      .crossJoin(broadcast(tot))
      .filter(col("cum") >= col("k"))
      .agg(min(col("b")).as("cut_b"))
    rows.crossJoin(broadcast(cut))
      .withColumn("split",
        when(col("b") <= col("cut_b") - embargoBuckets, "train")
          .when(col("b") <= col("cut_b"), "purged")
          .otherwise("test"))
      .groupBy("grp")
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "purged", 1L).otherwise(0L)).as("n_purged"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
        max(col("cut_b")).as("cut_bucket"))
      .select(col("grp").as(groupCol), col("n_train"), col("n_purged"),
        col("n_test"), col("cut_bucket"))
      .orderBy(groupCol)
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a total token budget across sources so that
    * no source repeats more than `epochs` times, and whatever budget
    * the capped (small) sources can't absorb spreads UNIFORMLY over the
    * rest — the closed-form alternative to temperature mixing
    * ([[temperatureMix]]) that bounds duplication instead of merely
    * flattening shares. Budget = total_tokens · budgetNum / budgetDen
    * (integer), derived from the corpus so the query is scale-free.
    *
    * The waterfill is closed-form, not iterative: with caps
    * cᵢ = nᵢ·epochs sorted ASCENDING, source i is capped iff
    * cᵢ·(S−i+1) ≤ B − Σ_{j<i} cⱼ (exact integer compare), and the
    * capped set is automatically a PREFIX of that order (cⱼ ≤ cᵢ and
    * more budget remains at j, so j capped follows from i capped).
    * The S−K uncapped sources split the remainder evenly; the
    * mod-(S−K) leftover goes to the smallest-capacity uncapped sources
    * first (deterministic, the [[quotaAllocate]] remainder rule).
    *
    * Scale shape: one map-side-combined token-count aggregation over
    * the corpus, then ALL allocation math on the source-cardinality
    * frame (two scalar cross joins, one bounded window) — integers
    * end to end, one rounded division for the reported epochs_used. */
  def unimaxAllocate(df: DataFrame, sourceCol: String, textCol: String,
                     epochs: Int, budgetNum: Long,
                     budgetDen: Long): DataFrame = {
    require(epochs >= 1, "epoch cap must be >= 1")
    require(budgetNum >= 0 && budgetDen >= 1, "budget ratio must be >= 0")
    val counts = df.select(col(sourceCol).as("source"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("_nt"))
      .groupBy("source").agg(sum(col("_nt")).as("n_tokens"))
    val tot = counts.agg(sum(col("n_tokens")).as("_tt"),
      count(lit(1)).as("_s"))
    val ranked = counts.crossJoin(broadcast(tot))
      .withColumn("cap_tokens", col("n_tokens") * lit(epochs.toLong))
      .withColumn("_budget",
        expr(s"(_tt * ${budgetNum}L) DIV ${budgetDen}L"))
      .withColumn("_rn", row_number().over(
        Ranked.bounded(col("cap_tokens"), col("source"))))
      .withColumn("_cum_prev", coalesce(sum(col("cap_tokens")).over(
        Ranked.bounded(col("cap_tokens"), col("source"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_capped",
        col("cap_tokens") * (col("_s") - col("_rn") + 1) <=
          col("_budget") - col("_cum_prev"))
    val cappedAgg = ranked.agg(
      sum(when(col("_capped"), lit(1L)).otherwise(lit(0L))).as("_k"),
      coalesce(sum(when(col("_capped"), col("cap_tokens"))), lit(0L))
        .as("_used"))
    val u = col("_s") - col("_k")
    val rem = col("_budget") - col("_used")
    val alloc = when(col("_capped") || u === 0L, col("cap_tokens"))
      .otherwise(expr("(_budget - _used) DIV (_s - _k)") +
        when(col("_rn") - col("_k") <= rem % u, lit(1L)).otherwise(lit(0L)))
    ranked.crossJoin(broadcast(cappedAgg))
      .select(col("source"), col("n_tokens"), col("cap_tokens"),
        alloc.as("alloc_tokens"),
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(TextFunctions.portableRound(
            alloc.cast("double") / col("n_tokens").cast("double"), 4))
          .as("epochs_used"))
      .orderBy("source")
  }

  /** Consistent-hash ring rebalance plan: assign every row to a shard
    * on an md5-60 ring (`vnodes` virtual nodes per shard — the
    * classic variance reducer) under the BEFORE and AFTER shard
    * counts, and report the transition matrix (shard_before,
    * shard_after, n_docs). Consistent hashing's point is exactly this
    * row count: growing n→n+1 shards moves only ~1/(n+1) of the keys
    * (mod-n sharding would move ~n/(n+1) of them) — the plan a 100 TB
    * store consults before adding capacity.
    *
    * The rings are tiny (shards × vnodes positions) and their
    * positions are pure md5 functions of "ring:shard:vnode", so both
    * rings are computed driver-side and EMBEDDED in a
    * [[graft.plans.RingAssign]] expression: assignment is ONE
    * codegen'd binary search per row — no join, no shuffle, nothing
    * broadcast — followed by one ≤(n·m)-group aggregate. (A
    * filter()-over-array-literal successor scan measured ~10× slower:
    * higher-order array functions run interpreted per row.) */
  def ringRebalance(df: DataFrame, idCol: String,
                    shardsBefore: Int, shardsAfter: Int,
                    vnodes: Int = 16): DataFrame = {
    require(shardsBefore >= 1 && shardsAfter >= 1 && vnodes >= 1,
      "shard counts and vnodes must be >= 1")
    def assign(n: Int, dpos: Column): Column = {
      val ring = (0 until n)
        .flatMap(s => (0 until vnodes).map(v =>
          (TextFunctions.md5Hash60Local(s"ring:$s:$v"), s)))
        .sortBy(_._1)
      org.apache.spark.sql.graft.bridge.column(graft.plans.RingAssign(
        org.apache.spark.sql.graft.bridge.expression(dpos),
        ring.map(_._1).toArray, ring.map(_._2).toArray))
    }
    val dpos = TextFunctions.md5Hash60(concat(lit("doc:"),
      col(idCol).cast("string")))
    df.select(assign(shardsBefore, dpos).as("shard_before"),
        assign(shardsAfter, dpos).as("shard_after"))
      .groupBy("shard_before", "shard_after")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("shard_before", "shard_after")
  }
}
