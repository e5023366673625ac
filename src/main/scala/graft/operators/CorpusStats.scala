package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level analytics for training-data curation: the vocabulary,
  * composition, novelty and length-distribution reports a data team
  * reads before deciding mixing weights and filter thresholds.
  *
  * All four operators are deterministic (fixed tiebreaks, integer
  * arithmetic until the final division, portable rounding) so their
  * results hash-match the DuckDB oracle bit for bit.
  */
object CorpusStats {

  /** Corpus vocabulary: the `k` most frequent lowercased whitespace
    * tokens, rank-numbered, ties broken by the term itself.
    *
    * Scale shape: explode → one map-side-combined hash aggregation on
    * term → distributed top-k (`orderBy.limit` plans as
    * TakeOrderedAndProject: each partition keeps k rows, the driver
    * merges — no global sort shuffle). The final rank window runs over
    * the ≤ k surviving rows only. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int = 500): DataFrame = {
    val counts = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    Ranked.rankBounded(counts, k,
        Seq(col("freq").desc, col("term").asc), rankCol = "rank")
      .select(col("rank"), col("term"), col("freq"))
  }

  /** Corpus composition report: per group (e.g. source × lang) the doc
    * count, char and token totals, and how many docs clear the quality
    * gate — the mixing dashboard. One map-side-combined aggregation;
    * every statistic is computed inside the same scan pass. */
  def compositionReport(df: DataFrame, groupCols: Seq[String],
                        textCol: String,
                        minQuality: Double = 0.3): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).cast("long").as("n_chars"),
        sum(TextFunctions.tokenCount(col(textCol))).cast("long").as("n_tok"),
        sum(when(TextFunctions.qualityScore(col(textCol)) >= minQuality,
          1L).otherwise(0L)).cast("long").as("n_quality"))

  /** Per-document bigram novelty: how much of a document's phrasing is
    * unique to it corpus-wide. Returns (doc_id, n_bigrams,
    * n_distinct, n_solo, novelty) where n_solo counts the distinct
    * bigrams appearing in NO other document and novelty =
    * n_solo / n_distinct (portable-rounded). The integer counts are the
    * LM-flavored signal (a doc of entirely corpus-common bigrams is
    * boilerplate; one of mostly solo bigrams is fresh text).
    *
    * Scale shape mirrors [[RepeatedSpans]]: bigrams reduce to 60-bit
    * hashes at scan time and are de-duplicated per doc BEFORE the
    * shuffle (array_distinct on the scan side), so the one
    * hash-partitioned window that computes document frequency carries
    * ~16 bytes per distinct (doc, bigram). */
  def bigramNovelty(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"),
        greatest(size(col("tk")) - 1, lit(0)).cast("long").as("n_bigrams"),
        col("tk"))
    // sequence(0, n-2) runs descending for n < 2 — filter first.
    val bi = base.filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("tk")) - 2),
          i => TextFunctions.md5Hash60(
            concat_ws(" ", slice(col("tk"), i + 1, lit(2))))))).as("h"))
    // rows are distinct per (doc, h), so a count over the h partition
    // IS the document frequency (the Contamination.scala convention)
    val per = bi
      .withColumn("docs", count(lit(1)).over(Window.partitionBy("h")))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_distinct"),
        sum(when(col("docs") === 1, 1L).otherwise(0L)).cast("long").as("n_solo"))
    base.select(col("doc_id"), col("n_bigrams"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("n_solo"), lit(0L)).as("n_solo"))
      .withColumn("novelty",
        when(col("n_distinct") === 0, lit(0.0))
          .otherwise(TextFunctions.portableRound(
            col("n_solo").cast("double") / col("n_distinct"), 4)))
  }

  /** Per-document vocabulary coverage: token count, tokens inside the
    * corpus top-`vocabK` vocabulary, and the out-of-vocabulary rate —
    * the tokenizer-coverage report that decides whether a vocab is big
    * enough for a corpus (high OOV docs degrade to byte-fallback).
    *
    * Scale shape: the vocabulary is ≤ vocabK rows → broadcast; the
    * corpus side is explode → broadcast left join → one per-doc
    * aggregation. Counts stay integer; the rate is portable-rounded. */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               vocabK: Int = 500): DataFrame = {
    val vocab = vocabTopK(df, textCol, vocabK)
      .select(col("term"), lit(1L).as("in_vocab"))
    val per = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(coalesce(col("in_vocab"), lit(0L))).cast("long").as("n_in_vocab"))
    df.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("n_in_vocab"), lit(0L)).as("n_in_vocab"))
      .withColumn("oov_rate",
        when(col("n_tok") === 0, lit(0.0))
          .otherwise(TextFunctions.portableRound(
            lit(1.0) - col("n_in_vocab").cast("double") /
              col("n_tok").cast("double"), 4)))
  }

  /** Hierarchical composition report: one aggregation producing every
    * ROLLUP level (source × lang, per source, grand total) in a single
    * shuffle — the mixing dashboard's drill-down table without N
    * separate GROUP BYs over a 100 TB scan. `grouping()` flags
    * disambiguate subtotal rows from genuine NULL dimension values
    * (cast to int — the engines' native grouping types differ). */
  def rollupReport(df: DataFrame, dim1: String, dim2: String,
                   textCol: String): DataFrame =
    df.rollup(col(dim1), col(dim2))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col(textCol))).cast("long").as("n_tok"),
        grouping(col(dim1)).cast("int").as("g1"),
        grouping(col(dim2)).cast("int").as("g2"))

  /** Per-document unigram cross-entropy (bits per token) under the
    * corpus's OWN unigram model — the CCNet-style perplexity signal:
    * documents whose token distribution is far from the corpus (very
    * high bpt: random strings, OCR noise; very low bpt: degenerate
    * repetition of the most common words) are filter candidates at
    * both tails.
    *
    * bpt(d) = −(1/n_d) Σ_t log2 p̂(t), with p̂ = (cnt+1)/(T+V) add-1
    * smoothed over the observed vocabulary (tokens keyed by 60-bit md5
    * hashes — the house convention — so the model table shuffles
    * 16-byte keys). T = corpus tokens, V = distinct hashes.
    *
    * Cross-engine float determinism (r16 — the quantize-then-integer-
    * sum recipe replaces the r13 sorted-fold): each TERM's
    * contribution c·log2((cnt+1)/(T+V)) is quantized to an integer
    * (`floor(term × 1e6)`) BEFORE the per-doc reduction, so the sum is
    * exact integer arithmetic in ANY order — a plain codegen
    * `sum(long)` here, a plain `sum(BIGINT)` in the oracle — and the
    * old collect_list + array_sort + interpreted `aggregate` fold
    * (HofAudit: 1.61× stage tax, plus the per-doc array
    * materialization) is gone. Totals enter as exact integers; the
    * result is portable-rounded.
    *
    * Scale shape: one explode → per-doc-hash and global-hash
    * aggregations; the model join is hash-keyed (shuffle or broadcast
    * at the planner's discretion — the model has one row per distinct
    * corpus token, so NOT forced broadcast); per-doc state is now two
    * LONGS (was: the doc's distinct-token struct list). Output:
    * (doc_id, n_tok, bpt); tokenless docs 0. */
  def unigramBits(df: DataFrame, idCol: String, textCol: String,
                  roundTo: Int = 4): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .select(col("doc_id"), TextFunctions.md5Hash60(col("term")).as("h"))
    val g = toks.groupBy("h").agg(count(lit(1)).as("cnt"))
    val totRow = g.agg(sum(col("cnt")), count(lit(1))).head()
    val tv =
      (if (totRow.isNullAt(0)) 0L else totRow.getLong(0)) + totRow.getLong(1)
    val dc = toks.groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
    val per = dc.join(g, Seq("h"))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_tok"),
        sum(floor(col("c").cast("double") *
          log2((col("cnt").cast("double") + lit(1.0)) / lit(tv.toDouble)) *
          lit(1e6))).as("q"))
      .select(col("doc_id"), col("n_tok"),
        TextFunctions.portableRound(
          (lit(0.0) - col("q").cast("double") / lit(1e6)) /
            col("n_tok").cast("double"),
          roundTo).as("bpt"))
    df.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("bpt"), lit(0.0)).as("bpt"))
  }

  /** Pairwise Jensen–Shannon divergence between the groups' hashed
    * unigram distributions — the drift/similarity matrix a data team
    * reads to decide whether two sources are near-duplicates of each
    * other, whether a new crawl drifted from the last one, and how
    * "far apart" mixture components are. Symmetric, bounded by ln 2,
    * zero iff identical.
    *
    * Distributions are add-1 smoothed over a FIXED `buckets`-bucket
    * hash space, and the divergence sums over the whole space (the
    * smoothing mass of unseen buckets contributes), so the state per
    * group is exactly `buckets` integers regardless of corpus size.
    * The per-pair float sum folds over the bucket-SORTED list — the
    * [[Sampling.dsirWeights]] determinism recipe. One token scan, one
    * (group, bucket) aggregation; the pair join is over
    * groups² × buckets rows, all bounded by construction. */
  def jsDivergence(df: DataFrame, groupCol: String, textCol: String,
                   buckets: Int = 512, roundTo: Int = 4): DataFrame = {
    val toks = df.select(col(groupCol).as("g"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .select(col("g"), (TextFunctions.md5Hash60(col("term")) % buckets)
        .as("h"))
    val cnt = toks.groupBy("g", "h").agg(count(lit(1)).as("c"))
    val tot = toks.groupBy("g").agg(count(lit(1)).as("t"))
    // full (group × bucket) grid by exploding a literal sequence —
    // a per-group generator, not a cross join
    val grid = toks.select("g").distinct()
      .select(col("g"),
        explode(sequence(lit(0L), lit(buckets - 1L))).as("h"))
    val full = grid.join(cnt, Seq("g", "h"), "left")
      .select(col("g"), col("h"), coalesce(col("c"), lit(0L)).as("c"))
    val pair = full.as("a").join(full.as("b"),
        col("a.h") === col("b.h") && col("a.g") < col("b.g"))
      .select(col("a.g").as("g1"), col("b.g").as("g2"), col("a.h").as("h"),
        col("a.c").as("c1"), col("b.c").as("c2"))
    val arr = pair
      .join(tot.select(col("g").as("g1"), col("t").as("t1")), Seq("g1"))
      .join(tot.select(col("g").as("g2"), col("t").as("t2")), Seq("g2"))
      .groupBy("g1", "g2", "t1", "t2")
      .agg(array_sort(collect_list(struct(col("h"), col("c1"), col("c2"))))
        .as("l"))
    arr.select(col("g1"), col("g2"),
      TextFunctions.portableRound(
        aggregate(col("l"), lit(0.0), (acc, s) => {
          val p = (s.getField("c1").cast("double") + lit(1.0)) /
            (col("t1") + lit(buckets)).cast("double")
          val q = (s.getField("c2").cast("double") + lit(1.0)) /
            (col("t2") + lit(buckets)).cast("double")
          val m = (p + q) / lit(2.0)
          acc + lit(0.5) * (p * log(p / m) + q * log(q / m))
        }), roundTo).as("jsd"))
  }

  /** Per-group percentile normalization: percent_rank of `valueCol`
    * within each group — the quality-calibration step that makes a
    * threshold mean the same thing in every source (raw score
    * distributions differ per domain; "drop the worst decile" should
    * not gut one source and spare another). percent_rank is
    * (rank−1)/(n−1) over exact integers — bit-identical across
    * engines with no rounding discipline; ties share a rank, so the
    * result is layout-independent. One window shuffle on the group. */
  def percentileNormalize(df: DataFrame, groupCol: String,
                          valueCol: String): DataFrame =
    df.withColumn("pctl", percent_rank().over(
      Window.partitionBy(groupCol).orderBy(valueCol)))

  /** EXACT per-group quartiles with neither per-group buffering nor a
    * sketch — the third point in the quantile design space next to
    * [[lengthQuantiles]]' two: build the (group, value) count
    * histogram, running-sum it in value order, and read q_p as the
    * smallest value whose cumulative count reaches ⌈p·n⌉ (pure
    * integer compares — `cum·4 ≥ n`, `cum·2 ≥ n`, `cum·4 ≥ 3n` — so
    * the result is engine-exact with zero rounding discipline).
    *
    * Why this is the 100 TB shape for DISCRETE values (token counts,
    * lengths, scores quantized at the edge): state per group is one
    * row per DISTINCT value — bounded by value cardinality, not row
    * count — and every step is a hash aggregate or a group-partitioned
    * window; nothing buffers a group's rows and nothing approximates.
    * For continuous unbounded values, quantize first or fall back to
    * the sketch path. Output: (group, n, q25, q50, q75) with discrete
    * lower-quantile semantics (no interpolation). */
  def histQuantiles(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val t = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val h = t.groupBy("g", "v").agg(count(lit(1)).as("c"))
    val n = t.groupBy("g").agg(count(lit(1)).as("n"))
    val cum = h.withColumn("cum", sum(col("c")).over(
      Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.join(n, Seq("g"))
      .groupBy(col("g"), col("n"))
      .agg(
        min(when(col("cum") * 4 >= col("n"), col("v"))).as("q25"),
        min(when(col("cum") * 2 >= col("n"), col("v"))).as("q50"),
        min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as("q75"))
      .select(col("g").as(groupCol), col("n"), col("q25"), col("q50"),
        col("q75"))
  }

  /** Per-group length quantiles (p25/p50/p75) plus min/max/count.
    *
    * `approx = false` (default): exact `percentile` with linear
    * interpolation — the `quantile_cont` definition, which is what
    * lets the cross-engine oracle hash-match (x47). Exact percentile
    * buffers each group's values: fine while a group fits an
    * executor, the wrong tool at 100 TB.
    *
    * `approx = true`: `percentile_approx` (Greenwald-Khanna sketch,
    * `accuracy` controls the ε = 1/accuracy rank-error bound) —
    * identical plan shape and output schema, O(accuracy) state per
    * group regardless of group size. Rank error ε means the returned
    * p50 is some value whose true rank is within n·ε of the target —
    * CorpusStatsSpec bounds it against the exact path. */
  def lengthQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      approx: Boolean = false,
                      accuracy: Int = 10000): DataFrame = {
    val v = col(valueCol).cast("double")
    def pct(p: Double) =
      if (approx) percentile_approx(v, lit(p), lit(accuracy)).cast("double")
      else percentile(v, lit(p))
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        min(col(valueCol)).cast("long").as("min_v"),
        max(col(valueCol)).cast("long").as("max_v"),
        pct(0.25).as("p25"),
        pct(0.5).as("p50"),
        pct(0.75).as("p75"))
  }

  /** Zipf-law fit over the top-`topN` token frequencies: least-squares
    * regression of ln(freq) on ln(rank). A healthy natural-language
    * corpus fits slope ≈ −1 with high r²; a corpus drowning in
    * boilerplate (one template at every rank) or in serial-numbered
    * junk (flat head) bends away — this is the one-row dashboard
    * number that says "this crawl stopped looking like language".
    *
    * Scale shape: token count (one shuffle, map-side combined) →
    * distributed top-N (`TakeOrderedAndProject`) → a single 200-row
    * array fold. Determinism: ranks and counts enter ln() as exact
    * integers; every Σ folds sequentially over the rank-ordered array
    * (ties in count carry equal y, so tie order cannot move any sum);
    * outputs portable-rounded. Within-tie rank assignment uses count
    * desc then term desc — mirrored on both engines. */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 200,
              roundTo: Int = 4): DataFrame = {
    val top = df.select(
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("term")).limit(topN)
    val one = top
      .agg(reverse(array_sort(collect_list(struct(col("cnt"), col("term")))))
        .as("arr"))
      .select(size(col("arr")).as("n"), col("arr"))
    def fold(xs: Column): Column =
      aggregate(xs, lit(0.0), (acc, x) => acc + x)
    // x = ln(rank) via transform-with-index (no sequence(1, n): Spark's
    // sequence runs DESCENDING for n = 0); rank = 0-based index + 1
    def lnRank(j: Column): Column = log((j + lit(1)).cast("double"))
    def lnCnt(s: Column): Column = log(s.getField("cnt").cast("double"))
    val withSums = one.select(col("n"),
      fold(transform(col("arr"), (_, j) => lnRank(j))).as("sx"),
      fold(transform(col("arr"), s => lnCnt(s))).as("sy"),
      fold(transform(col("arr"), (s, j) => lnRank(j) * lnCnt(s))).as("sxy"),
      fold(transform(col("arr"), (_, j) => lnRank(j) * lnRank(j))).as("sxx"),
      fold(transform(col("arr"), s => lnCnt(s) * lnCnt(s))).as("syy"))
    val n = col("n").cast("double")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val varx = n * col("sxx") - col("sx") * col("sx")
    val vary = n * col("syy") - col("sy") * col("sy")
    // degenerate heads (one term, or a perfectly flat y) have no
    // defined fit — report 0 rather than divide by zero (ANSI throws)
    val slope = when(varx === 0.0, lit(0.0)).otherwise(cov / varx)
    withSums.select(
      col("n").cast("long").as("n_terms"),
      TextFunctions.portableRound(slope + lit(1000.0), roundTo)
        .minus(lit(1000.0)).as("slope"),
      TextFunctions.portableRound(
        when(col("n") === 0, lit(0.0))
          .otherwise((col("sy") - slope * col("sx")) / n), roundTo)
        .as("intercept"),
      TextFunctions.portableRound(
        when(varx * vary === 0.0, lit(0.0))
          .otherwise(cov * cov / (varx * vary)), roundTo).as("r2"))
  }

  /** Pairwise source similarity over term-frequency profiles: each
    * group's count vector over the GLOBAL top-`topK` terms, cosine
    * between every group pair — the corpus-composition fingerprint
    * ("which sources are the same crawl wearing different names") that
    * drives mixture decisions before [[Sampling.doremiWeights]]-class
    * reweighting. Exact integer dot products and norms (DECIMAL — a
    * count² sum outgrows Int64 on billion-token sources), one rounded
    * division per pair.
    *
    * Scale shape: the global top-K is an orderBy().limit(K) (bounded
    * rank — K rows cross the driver barrier, nothing else); profiles
    * are |groups|·K rows; the pair join is |groups|²·K on a
    * BOUNDED-cardinality key (sources, not documents). */
  def sourceSimilarity(df: DataFrame, groupCol: String, textCol: String,
                       topK: Int = 50, roundTo: Int = 4): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val tok = df.select(col(groupCol).as("grp"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("t"))
    val top = tok.groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("t")).limit(topK).select("t")
    val prof = tok.join(broadcast(top), Seq("t"))
      .groupBy("grp", "t").agg(count(lit(1)).as("c"))
    val norms = prof.groupBy("grp")
      .agg(sum((col("c") * col("c")).cast(dec)).as("n2"))
    val dots = prof.select(col("grp").as("ga"), col("t"), col("c").as("cva"))
      .join(prof.select(col("grp").as("gb"), col("t"), col("c").as("cvb")),
        Seq("t"))
      .filter(col("ga") < col("gb"))
      .groupBy("ga", "gb")
      .agg(sum((col("cva") * col("cvb")).cast(dec)).as("dot"))
    dots
      .join(norms.select(col("grp").as("ga"), col("n2").as("na2")), Seq("ga"))
      .join(norms.select(col("grp").as("gb"), col("n2").as("nb2")), Seq("gb"))
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        TextFunctions.portableRound(
          col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) *
              sqrt(col("nb2").cast("double"))), roundTo).as("cosine"))
      .orderBy("source_a", "source_b")
  }

  /** Term burstiness: variance-to-mean ratio of per-DOCUMENT counts
    * (zeros included) for the top-`topK` corpus terms — a term whose
    * occurrences clump into few documents (VMR ≫ 1) is navigation
    * boilerplate, spam bursts, or a template artifact; true content
    * words sit near Poisson (VMR ≈ 1). The dispersion lens the
    * frequency-only vocab reports (x44/x87) cannot see.
    *
    * Exact: VMR = (N·Σc² − (Σc)²) / (N·Σc) from three integer sums
    * per term (zeros enter only through N — no zero rows are ever
    * materialized); DECIMAL products (the Pca lesson), one division.
    * One (doc, term) count pass + one per-term rollup, map-side
    * combined. */
  def burstiness(df: DataFrame, idCol: String, textCol: String,
                 topK: Int = 100, roundTo: Int = 4): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val nDocs = df.count()
    val dc = df.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("t"))
      .groupBy("id", "t").agg(count(lit(1)).as("c"))
    val per = dc.groupBy("t")
      .agg(sum(col("c")).as("cnt"),
        sum((col("c") * col("c")).cast(dec)).as("c2"),
        count(lit(1)).as("n_docs_with"))
      .orderBy(desc("cnt"), col("t")).limit(topK)
    per.select(col("t").as("term"), col("cnt"), col("n_docs_with"),
      TextFunctions.portableRound(
        when(col("cnt") === 0L, lit(0.0))
          .otherwise(
            (lit(nDocs).cast(dec) * col("c2") -
              col("cnt").cast(dec) * col("cnt").cast(dec)).cast("double") /
              (lit(nDocs).cast(dec) * col("cnt").cast(dec)).cast("double")),
        roundTo).as("vmr"))
      .orderBy(desc("cnt"), col("term"))
  }

  /** Good–Turing unseen-mass estimate per group: frequency-of-
    * frequencies over the group's vocabulary — N₁ (hapaxes), N₂
    * (doubletons), p₀ = N₁/T as the classic estimate of how much
    * probability mass belongs to words the corpus has NOT seen yet,
    * and r₁* = 2·N₂/N₁ as the GT-discounted count for singletons.
    * The per-source "how much more vocabulary is out there" gauge
    * that pairs with [[heapsFit]]'s growth curve (Heaps says how fast
    * vocab grows; Good–Turing says how much of today's token stream
    * is first-sightings).
    *
    * Scale shape: one (group, term) count aggregation, then a
    * per-group rollup — both map-side combined. Exact integers until
    * the two final divisions. */
  def goodTuring(df: DataFrame, groupCol: String, textCol: String,
                 roundTo: Int = 4): DataFrame = {
    val tc = df.select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("t"))
      .groupBy("grp", "t").agg(count(lit(1)).as("c"))
    tc.groupBy("grp")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1L, lit(1L)).otherwise(lit(0L))).as("n1"),
        sum(when(col("c") === 2L, lit(1L)).otherwise(lit(0L))).as("n2"))
      .select(col("grp").as(groupCol), col("n_tokens"), col("vocab"),
        col("n1"), col("n2"),
        TextFunctions.portableRound(
          when(col("n_tokens") === 0L, lit(0.0))
            .otherwise(col("n1").cast("double") /
              col("n_tokens").cast("double")), roundTo).as("p0_unseen"),
        TextFunctions.portableRound(
          when(col("n1") === 0L, lit(0.0))
            .otherwise(lit(2.0) * col("n2").cast("double") /
              col("n1").cast("double")), roundTo).as("r1_star"))
  }

  /** Heaps'-law vocabulary-growth fit: V(T) ≈ K·T^β measured at
    * `checkpoints` doc-id prefixes of the corpus (ids are the
    * ingestion order key), with β/ln K from an exact OLS over the
    * ln-ln checkpoint curve — the capacity-planning dual of
    * [[zipfFit]] (how fast does the vocab table grow as the corpus
    * grows; β drifting toward 1 flags an id-like token leak).
    *
    * Scale shape: thresholds are two collected scalars (min/max id —
    * the k-means pattern); per-term first-sight is ONE hash
    * aggregation (min doc_id per term); every checkpoint statistic is
    * a conditional sum inside a single-row aggregate — no global
    * windows, no per-checkpoint rescans. Determinism: all checkpoint
    * counts are exact longs; the only floats are the ln-ln OLS folds,
    * run in checkpoint order over a ≤`checkpoints`-element array.
    * Output: one row per checkpoint (chk, max_doc_id, n_docs,
    * n_tokens, vocab) with beta / ln_k / r2 replicated per row;
    * checkpoints with zero tokens or vocab are excluded from the fit
    * (ln undefined) but still reported. */
  def heapsFit(df: DataFrame, idCol: String, textCol: String,
               checkpoints: Int = 10, roundTo: Int = 4): DataFrame = {
    require(checkpoints >= 2, "heaps fit needs at least 2 checkpoints")
    val spark = df.sparkSession
    val bounds = df.agg(min(col(idCol).cast("long")),
      max(col(idCol).cast("long"))).head()
    require(!bounds.isNullAt(0), "heaps fit: empty corpus")
    val lo = bounds.getLong(0); val hi = bounds.getLong(1)
    val span = hi - lo + 1
    val chks: Seq[(Int, Long)] = (1 to checkpoints)
      .map(i => i -> (lo - 1 + i * span / checkpoints))
    val toks = df.select(col(idCol).cast("long").as("id"),
      TextFunctions.tokens(lower(col(textCol))).as("tk"))
    val first = toks.select(col("id"), explode(col("tk")).as("t"))
      .groupBy("t").agg(min(col("id")).as("f"))
    def sums(src: DataFrame, mk: (Int, Long) => Seq[Column]) = {
      val cols = chks.flatMap { case (i, c) => mk(i, c) }
      src.agg(cols.head, cols.tail: _*)
    }
    val docAgg = sums(
      toks.select(col("id"), size(col("tk")).cast("long").as("nt")),
      (i, c) => Seq(
        sum(when(col("id") <= c, lit(1L)).otherwise(lit(0L))).as(s"d$i"),
        sum(when(col("id") <= c, col("nt")).otherwise(lit(0L))).as(s"t$i")))
    val vocAgg = sums(first,
      (i, c) => Seq(
        sum(when(col("f") <= c, lit(1L)).otherwise(lit(0L))).as(s"v$i")))
    val rows = docAgg.crossJoin(vocAgg)
      .select(explode(array(chks.map { case (i, c) =>
        struct(lit(i).as("chk"), lit(c).as("max_doc_id"),
          col(s"d$i").as("n_docs"), col(s"t$i").as("n_tokens"),
          col(s"v$i").as("vocab"))
      }: _*)).as("r"))
      .select(col("r.chk"), col("r.max_doc_id"), col("r.n_docs"),
        col("r.n_tokens"), col("r.vocab"))
    // ln-ln OLS over the checkpoint curve, folded in chk order
    val fitArr = rows
      .agg(array_sort(collect_list(struct(col("chk"),
        col("n_tokens").as("t"), col("vocab").as("v")))).as("arr0"))
      .select(filter(col("arr0"), s =>
        s.getField("t") > 0L && s.getField("v") > 0L).as("arr"))
    def fold(xs: Column): Column =
      aggregate(xs, lit(0.0), (acc, x) => acc + x)
    def lnT(s: Column): Column = log(s.getField("t").cast("double"))
    def lnV(s: Column): Column = log(s.getField("v").cast("double"))
    val withSums = fitArr.select(size(col("arr")).as("n"),
      fold(transform(col("arr"), s => lnT(s))).as("sx"),
      fold(transform(col("arr"), s => lnV(s))).as("sy"),
      fold(transform(col("arr"), s => lnT(s) * lnV(s))).as("sxy"),
      fold(transform(col("arr"), s => lnT(s) * lnT(s))).as("sxx"),
      fold(transform(col("arr"), s => lnV(s) * lnV(s))).as("syy"))
    val n = col("n").cast("double")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val varx = n * col("sxx") - col("sx") * col("sx")
    val vary = n * col("syy") - col("sy") * col("sy")
    val slope = when(col("varx") === 0.0, lit(0.0))
      .otherwise(col("cov") / col("varx"))
    val fit = withSums
      .select(col("n"), cov.as("cov"), varx.as("varx"), vary.as("vary"),
        col("sx"), col("sy"))
      .select(
        TextFunctions.portableRound(slope + lit(1000.0), roundTo)
          .minus(lit(1000.0)).as("beta"),
        TextFunctions.portableRound(
          when(col("n") === 0, lit(0.0))
            .otherwise((col("sy") - slope * col("sx")) / col("n").cast("double"))
            + lit(1000.0), roundTo).minus(lit(1000.0)).as("ln_k"),
        TextFunctions.portableRound(
          when(col("varx") * col("vary") === 0.0, lit(0.0))
            .otherwise(col("cov") * col("cov") / (col("varx") * col("vary"))),
          roundTo).as("r2"))
    rows.crossJoin(broadcast(fit)).orderBy("chk")
  }

  /** Bigram language-model score: bits per bigram under the corpus's
    * own add-1-smoothed bigram model — the KenLM-style perplexity
    * filter one step up from [[unigramBits]] (context-aware: catches
    * scrambled-word soup that unigram stats score as fluent).
    * p(t₂|t₁) = (c(t₁t₂)+1) / (c(t₁·)+V), V = distinct unigram count.
    *
    * Scale shape: one pass builds per-doc hashed bigram arrays (no
    * self-join — adjacent pairs come from one `zip_with` over the
    * token array); global model = two map-side-combined counts; the
    * per-doc score joins model rows for the doc's DISTINCT bigrams
    * only. Determinism: the x67 recipe — exact-integer counts, fold
    * over the (h1,h2)-sorted list, portable-round last. */
  def bigramBits(df: DataFrame, idCol: String, textCol: String,
                 roundTo: Int = 4): DataFrame =
    // self-model: the count table is corpus-sized, so recomputing its
    // lineage where the plan needs it twice beats materializing it
    // (measured at sf1: localCheckpoint cost ~2× the duplicated scan)
    bigramBitsSubset(df, idCol, textCol, lit(true), roundTo,
      materializeModel = false)

  /** [[bigramBitsAgainst]] for the common case where the MODEL corpus
    * is a SUBSET of the scored corpus selected by a per-row predicate
    * (x182's CCNet shape: train on the Gopher-clean rows, score all;
    * x88's self-model is `modelPred = true`, which the optimizer folds
    * away). The model-count side pays ONE bigram explode+shuffle
    * instead of round-9's two: the context marginal is DERIVED from
    * the joint table — c(h₁·) = Σ_{h₂} c(h₁h₂) over the vocab-sized
    * c2, never a second pass over corpus bigrams — exactly the direct
    * count, so the oracle SQL is unchanged. Remaining scans: model
    * bigrams (c2), model unigram vocab (the scalar V — token-grained,
    * can't ride the bigram pass), scored-corpus bigrams (dc). */
  def bigramBitsSubset(df: DataFrame, idCol: String, textCol: String,
                       modelPred: Column, roundTo: Int = 4,
                       materializeModel: Boolean = true,
                       broadcastMaxModelTokens: Long = 3000000L): DataFrame = {
    def hashed(src: DataFrame) = src.select(col(idCol).as("doc_id"),
      TextFunctions.hashedTokens(col(textCol)).as("hs"))
    def bigrams(src: DataFrame) = {
      val nb = greatest(size(col("hs")) - 1, lit(0))
      src.select(col("doc_id"),
          explode(zip_with(slice(col("hs"), lit(1), nb),
            slice(col("hs"), lit(2), nb),
            (a, b) => struct(a.as("h1"), b.as("h2")))).as("b"))
        .select(col("doc_id"), col("b.h1"), col("b.h2"))
    }
    val model = df.filter(modelPred)
    // When the model is the curated SMALL subset (the CCNet contract),
    // its hashed token table is materialized ONCE (eager
    // localCheckpoint): the joint counts, the derived marginal and the
    // vocabulary scalar all derive from it without re-scanning and
    // re-gating the corpus — three full scan+tokenize passes become
    // one. Self-model callers (model = corpus) skip it: a corpus-sized
    // materialization costs more than the duplicated scan (measured
    // ~2× at sf1).
    val mhsRaw = hashed(model)
    val mhs = if (materializeModel) mhsRaw.localCheckpoint() else mhsRaw
    val c2 = bigrams(mhs).groupBy("h1", "h2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("h1").agg(sum(col("c2")).as("c1"))
    val v = mhs.select(explode(col("hs")).as("h"))
      .agg(count_distinct(col("h"))).head().getLong(0)
    // per-bigram-TYPE log score quantized to an exact ×10⁸ long, then
    // weighted by the occurrence count (the ESS/Pca discipline): the
    // per-doc reduction is an order-free, map-side-combinable long sum
    // — replacing round-9's sorted collect_list fold, the catalog's
    // biggest single shuffle (163 MB of struct arrays at sf1). The
    // log2 double is one IEEE tree both engines compute
    // bit-identically; per-doc sums stay under 2⁶² at any corpus size
    // (bounded by doc length, not corpus size).
    val logQ = floor(
      log2((coalesce(col("c2"), lit(0L)).cast("double") + lit(1.0)) /
        (coalesce(col("c1"), lit(0L)) + lit(v)).cast("double")) *
      lit(1e8) + lit(0.5)).cast("long")
    // Join strategy from the MEASURED model size, never the caller
    // flag alone: a "clean subset" model is corpus-PROPORTIONAL in the
    // CCNet shape (x182), so a forced broadcast would hit Spark's 8 GB
    // broadcast ceiling / driver OOM at scale with no fallback. The
    // gate measures model TOKENS — one cheap agg over the
    // already-materialized token table, and an upper bound on bigram
    // TYPES (|c2| ≤ tokens), so it is conservative by construction and
    // costs no extra materialization of c2 itself. Above the gate the
    // shuffle path below takes over (value-identical — same left
    // joins, same logQ tree).
    val broadcastModel = materializeModel &&
      mhs.agg(coalesce(sum(size(col("hs"))), lit(0L))).head().getLong(0) <=
        broadcastMaxModelTokens
    val per = if (broadcastModel) {
      // small-model path: the raw bigram stream joins the BROADCAST
      // model tables and aggregates straight to doc grain — the only
      // shuffle left is |docs| rows of (n_big, tq) partial sums
      bigrams(hashed(df))
        .join(broadcast(c2), Seq("h1", "h2"), "left")
        .join(broadcast(c1), Seq("h1"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_big"), sum(logQ).as("tq"))
    } else {
      // self-model / over-gate path: model tables are corpus-sized (or
      // measured too large to broadcast), so shrink the stream to
      // per-doc distinct counts first and shuffle-join
      val dc = bigrams(hashed(df)).groupBy("doc_id", "h1", "h2")
        .agg(count(lit(1)).as("c"))
      dc.join(c2, Seq("h1", "h2"), "left").join(c1, Seq("h1"), "left")
        .groupBy("doc_id")
        .agg(sum(col("c")).cast("long").as("n_big"),
          sum(col("c") * logQ).as("tq"))
    }
    val scored = per.select(col("doc_id"), col("n_big"),
      TextFunctions.portableRound(
        (lit(0.0) - col("tq").cast("double") / lit(1e8)) /
          col("n_big").cast("double"),
        roundTo).as("bpt2"))
    df.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("bpt2"), lit(0.0)).as("bpt2"))
  }

  /** [[bigramBits]] with the MODEL corpus decoupled from the SCORED
    * corpus — the CCNet shape: train the small LM on a clean reference
    * subset, score EVERY document against it. Add-1 smoothing makes
    * out-of-model bigrams well-defined: a bigram the model never saw
    * scores (0+1)/(c₁+V), and an unseen context scores 1/V — so the
    * left joins below coalesce missing counts to 0 and the arithmetic
    * tree is unchanged. With model == score the joins are effectively
    * inner and this IS [[bigramBits]] (every scored bigram exists in
    * the model tables), value-identical. */
  def bigramBitsAgainst(model: DataFrame, scoreDf: DataFrame,
                        idCol: String, textCol: String,
                        roundTo: Int = 4): DataFrame = {
    def hashed(src: DataFrame) = src.select(col(idCol).as("doc_id"),
      TextFunctions.hashedTokens(col(textCol)).as("hs"))
    def bigrams(src: DataFrame) = {
      val nb = greatest(size(col("hs")) - 1, lit(0))
      src.select(col("doc_id"),
          explode(zip_with(slice(col("hs"), lit(1), nb),
            slice(col("hs"), lit(2), nb),
            (a, b) => struct(a.as("h1"), b.as("h2")))).as("b"))
        .select(col("doc_id"), col("b.h1"), col("b.h2"))
    }
    val mh = hashed(model)
    val mg = bigrams(mh)
    // the context marginal DERIVES from the joint table (c(h₁·) =
    // Σ_{h₂} c(h₁h₂)) over the vocab-sized table, not a second
    // corpus-bigram pass — see bigramBitsSubset for the full recipe
    val c2 = mg.groupBy("h1", "h2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("h1").agg(sum(col("c2")).as("c1"))
    val v = mh.select(explode(col("hs")).as("h"))
      .agg(count_distinct(col("h"))).head().getLong(0)
    val hs = hashed(scoreDf)
    val df = scoreDf
    val dc = bigrams(hs).groupBy("doc_id", "h1", "h2")
      .agg(count(lit(1)).as("c"))
    // order-free quantized-term sum — see bigramBitsSubset
    val logQ = floor(
      log2((coalesce(col("c2"), lit(0L)).cast("double") + lit(1.0)) /
        (coalesce(col("c1"), lit(0L)) + lit(v)).cast("double")) *
      lit(1e8) + lit(0.5)).cast("long")
    val per = dc.join(c2, Seq("h1", "h2"), "left").join(c1, Seq("h1"), "left")
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_big"),
        sum(col("c") * logQ).as("tq"))
      .select(col("doc_id"), col("n_big"),
        TextFunctions.portableRound(
          (lit(0.0) - col("tq").cast("double") / lit(1e8)) /
            col("n_big").cast("double"),
          roundTo).as("bpt2"))
    df.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("bpt2"), lit(0.0)).as("bpt2"))
  }

  /** Interpolated trigram language-model score: bits per trigram under
    * a Jelinek–Mercer mixture of the corpus's own trigram, bigram and
    * add-1 unigram models — the CCNet-shaped perplexity filter (a small
    * LM scores every document; high bits-per-token = noise, very low =
    * boilerplate). p(t₃|t₁t₂) = λ₃·c₃(t₁t₂t₃)/c₃(t₁t₂·)
    * + λ₂·c₂(t₂t₃)/c₂(t₂·) + λ₁·(c₁(t₃)+1)/(N+V). The λ₃ and λ₂ terms
    * are never 0/0 — any trigram/bigram a document contains is in the
    * global tables with its context, so interpolation (not backoff
    * branching) keeps the expression one arithmetic tree.
    *
    * Scale shape: same as [[bigramBits]] — per-doc hashed n-gram arrays
    * from `zip_with` (no self-join), three map-side-combined global
    * count tables, and the per-doc score joins model rows for the doc's
    * DISTINCT trigrams only. Determinism: exact-integer counts, fold
    * over the hash-sorted struct list, portable-round last; the scalar
    * N+V is collected once (two longs) and enters as one double. */
  def trigramBits(df: DataFrame, idCol: String, textCol: String,
                  l3: Double = 0.7, l2: Double = 0.2, l1: Double = 0.1,
                  roundTo: Int = 4): DataFrame = {
    val hs = df.select(col(idCol).as("doc_id"),
      TextFunctions.hashedTokens(col(textCol)).as("hs"))
    val nb = greatest(size(col("hs")) - 1, lit(0))
    val nt = greatest(size(col("hs")) - 2, lit(0))
    val bg = hs.select(col("doc_id"),
        explode(zip_with(slice(col("hs"), lit(1), nb),
          slice(col("hs"), lit(2), nb),
          (a, b) => struct(a.as("h1"), b.as("h2")))).as("b"))
      .select(col("b.h1"), col("b.h2"))
    val tg = hs.select(col("doc_id"),
        explode(zip_with(
          zip_with(slice(col("hs"), lit(1), nt), slice(col("hs"), lit(2), nt),
            (a, b) => struct(a.as("h1"), b.as("h2"))),
          slice(col("hs"), lit(3), nt),
          (ab, c) => struct(ab.getField("h1").as("h1"),
            ab.getField("h2").as("h2"), c.as("h3")))).as("b"))
      .select(col("doc_id"), col("b.h1"), col("b.h2"), col("b.h3"))
    val c3t = tg.groupBy("h1", "h2", "h3").agg(count(lit(1)).as("c3"))
    // context marginals DERIVED from the joint tables (the x88/x182
    // discipline): c(h₁h₂·) = Σ_{h₃} c₃ and c(h₁·) = Σ_{h₂} c₂ fold
    // over the vocab-sized count tables, never a second pass over
    // corpus n-grams — values identical, two explode+shuffles gone
    val cx2t = c3t.groupBy("h1", "h2").agg(sum(col("c3")).as("cx2"))
    val bc = bg.groupBy("h1", "h2").agg(count(lit(1)).as("c2"))
      .select(col("h1").as("bh1"), col("h2").as("bh2"), col("c2"))
    val cx1t = bc.groupBy(col("bh1").as("ch1"))
      .agg(sum(col("c2")).as("cx1"))
    val c1t = hs.select(explode(col("hs")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c1"))
    // N and V folded from the vocab-sized unigram table (Σc₁ and its
    // row count) — not a second token explode over the corpus
    val totRow = c1t.agg(coalesce(sum(col("c1")), lit(0L)),
      count(lit(1))).head()
    val nv = totRow.getLong(0) + totRow.getLong(1)
    val dc = tg.groupBy("doc_id", "h1", "h2", "h3").agg(count(lit(1)).as("c"))
    val p = (s: Column) =>
      lit(l3) * (s.getField("c3").cast("double") /
        s.getField("cx2").cast("double")) +
      lit(l2) * (s.getField("c2").cast("double") /
        s.getField("cx1").cast("double")) +
      lit(l1) * ((s.getField("c1").cast("double") + lit(1.0)) /
        lit(nv.toDouble))
    val per = dc.join(c3t, Seq("h1", "h2", "h3"))
      .join(cx2t, Seq("h1", "h2"))
      .join(bc, col("h2") === col("bh1") && col("h3") === col("bh2"))
      .join(cx1t, col("h2") === col("ch1"))
      .join(c1t, col("h3") === col("h"))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_tri"),
        array_sort(collect_list(struct(col("h1"), col("h2"), col("h3"),
          col("c"), col("c3"), col("cx2"), col("c2"), col("cx1"),
          col("c1")))).as("arr"))
      .select(col("doc_id"), col("n_tri"),
        TextFunctions.portableRound(
          (lit(0.0) - aggregate(col("arr"), lit(0.0), (acc, s) =>
            acc + s.getField("c").cast("double") * log2(p(s)))) /
            col("n_tri").cast("double"),
          roundTo).as("bpt3"))
    df.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("bpt3"), lit(0.0)).as("bpt3"))
  }

  /** Top-k collocations by pointwise mutual information over adjacent
    * lowercased token bigrams:
    * pmi = log2(c₂·N / (c₁ˡ(t1)·c₁ʳ(t2))), with the marginals taken
    * from the bigram table itself (left-slot and right-slot counts),
    * so the three counts form an exact contingency table.
    *
    * Scale shape: bigrams come from ONE zip_with pass per document (no
    * self-join), then three map-side-combined hash aggregations; the
    * `minCount` support floor cuts the c₂ table before the marginal
    * joins, and the final top-k plans as TakeOrderedAndProject.
    * Counts stay exact integers until one double division; the raw
    * products are cast to double BEFORE multiplying — `c₂·N` can pass
    * 2⁶³ on a 100 TB corpus, and both engines must overflow (not) the
    * same way. */
  def pmiTopK(df: DataFrame, textCol: String, minCount: Long = 5,
              k: Int = 100, roundTo: Int = 4): DataFrame = {
    val tk = df.select(TextFunctions.tokens(lower(col(textCol))).as("tk"))
    val nb = greatest(size(col("tk")) - 1, lit(0))
    val bg = tk.select(explode(zip_with(
        slice(col("tk"), lit(1), nb), slice(col("tk"), lit(2), nb),
        (a, b) => struct(a.as("t1"), b.as("t2")))).as("b"))
      .select(col("b.t1"), col("b.t2"))
    val c2 = bg.groupBy("t1", "t2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    val c1l = bg.groupBy("t1").agg(count(lit(1)).as("c1l"))
    val c1r = bg.groupBy("t2").agg(count(lit(1)).as("c1r"))
    val n = bg.count()
    c2.join(c1l, Seq("t1")).join(c1r, Seq("t2"))
      .select(col("t1"), col("t2"), col("c2"),
        TextFunctions.portableRound(
          log2((col("c2").cast("double") * lit(n.toDouble)) /
            (col("c1l").cast("double") * col("c1r").cast("double"))),
          roundTo).as("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(k)
  }

  /** Quality-curriculum ordering: split the corpus into `phases` bands
    * by a score column (band 1 = highest scores) and give each row a
    * deterministic pseudo-random position within its band — the
    * "sorted by difficulty, shuffled within stage" layout curriculum
    * training reads.
    *
    * Bands come from exact interpolated percentile CUTPOINTS, not
    * `ntile` — ntile is a global total-order sort (one reducer at
    * 100 TB); cutpoints are one small aggregate plus an embarrassingly
    * parallel comparison scan (swap in `approx = true` percentiles at
    * scale, same plan shape as [[lengthQuantiles]]). A row whose score
    * equals a cutpoint lands in the LOWER band (strict `>` arithmetic
    * on both engines). The in-band position `pos` IS the salted 60-bit
    * md5 of the id — a partition-independent, replayable shuffle key;
    * consumers order by (phase, pos, id). Deliberately NOT a dense
    * per-band `row_number`: a window partitioned by `phase` has only
    * `phases` partitions, so each band's rows would sort in a single
    * task — the same one-reducer bottleneck the cutpoint design
    * removes from banding. Dense 1..n positions, if a consumer truly
    * needs them, are a per-band zipWithIndex AFTER the write, at
    * whatever partition granularity that consumer shards by. */
  def curriculum(df: DataFrame, idCol: String, scoreCol: String,
                 phases: Int = 10): DataFrame = {
    require(phases >= 2, "need at least 2 phases")
    val ps = (1 until phases).map(i => lit(i.toDouble / phases))
    val cuts = df.agg(
      percentile(col(scoreCol).cast("double"), array(ps: _*)).as("cuts"))
    val phase = aggregate(col("cuts"), lit(1),
      (acc, c) => acc + when(col(scoreCol).cast("double") > c, 1)
        .otherwise(0))
    df.crossJoin(broadcast(cuts))
      .withColumn("phase", (lit(phases) + lit(1) - phase).cast("int"))
      .withColumn("pos", TextFunctions.md5Hash60(concat(lit("curriculum:"),
        col(idCol).cast("string"))))
      .drop("cuts")
  }

  /** Per-document Shannon entropy (bits) of the WITHIN-document token
    * distribution — the repetition-collapse detector one step finer
    * than [[Dedup.lineRepetition]]: a doc that loops a 5-word phrase
    * has near-zero entropy however long it grows, while natural prose
    * tracks log2 of its vocabulary.
    *
    * entropy = log2(n) − (Σ c·log2 c)/n over per-doc token counts c —
    * the counts stay exact integers; the one float fold runs over the
    * HASH-SORTED count list (the [[unigramBits]] determinism recipe),
    * so the result is identical at any partitioning and in any engine.
    *
    * Scale shape: one token scan, then a (doc, hash) aggregation whose
    * key count is docs × per-doc DISTINCT tokens (bounded by doc
    * length), then a per-doc fold — no corpus-global state at all, so
    * the operator is embarrassingly parallel at any corpus size. */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String,
                   roundTo: Int = 4): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .select(col("doc_id"), TextFunctions.md5Hash60(col("term")).as("h"))
    val dc = toks.groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
    val per = dc.groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_tok"),
        array_sort(collect_list(struct(col("h"), col("c")))).as("arr"))
      .select(col("doc_id"), col("n_tok"),
        TextFunctions.portableRound(
          log2(col("n_tok").cast("double")) -
            aggregate(col("arr"), lit(0.0), (acc, s) =>
              acc + s.getField("c").cast("double") *
                log2(s.getField("c").cast("double"))) /
              col("n_tok").cast("double"),
          roundTo).as("entropy"))
    df.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"))
  }

  /** Distinct-n diversity per group (Li et al. 2016's distinct-n,
    * computed per source): unique token n-grams / total token n-grams.
    * The metric synthetic-data pipelines watch to catch mode collapse —
    * a generator looping templates shows a falling ratio long before
    * loss moves.
    *
    * N-grams enumerate inside the row (`transform` over an index
    * sequence — no explode-then-self-join), keyed by 60-bit md5 of the
    * space-joined window so the distinct aggregation shuffles 8-byte
    * keys, not strings. Exact distinct via the (grp, h) pre-aggregation
    * — two hash shuffles total; swap the inner one for a KMV sketch
    * ([[Sketches]]) when exact counts stop mattering at 100 TB. */
  def distinctNgrams(df: DataFrame, groupCol: String, textCol: String,
                     n: Int = 3, roundTo: Int = 4): DataFrame = {
    require(n >= 1, "n >= 1")
    val tk = df.select(col(groupCol).as("grp"),
      TextFunctions.tokens(lower(col(textCol))).as("t"))
    val grams = tk.select(col("grp"), explode(
        when(size(col("t")) >= n, transform(
          sequence(lit(1), size(col("t")) - lit(n - 1)),
          i => TextFunctions.md5Hash60(
            concat_ws(" ", slice(col("t"), i, lit(n))))))
          .otherwise(array().cast("array<long>"))).as("h"))
    grams.groupBy("grp", "h").agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(sum(col("c")).cast("long").as("n_ngrams"),
        count(lit(1)).as("n_distinct"))
      .select(col("grp").as(groupCol), col("n_ngrams"), col("n_distinct"),
        TextFunctions.portableRound(
          col("n_distinct").cast("double") /
            greatest(col("n_ngrams"), lit(1L)).cast("double"),
          roundTo).as("distinct_ratio"))
  }

  /** Vocabulary coverage curve: cumulative share of total token mass
    * held by the top-`topN` terms — the "how big must the vocab be"
    * curve a tokenizer team reads off before fixing a vocab size
    * (coverage(rank) flattens where more vocabulary stops paying).
    *
    * One token scan + one term aggregation (map-side combined), a
    * distributed top-N (TakeOrderedAndProject), then the running sum —
    * a window over the N SURVIVORS only, never the full vocabulary.
    * Counts are exact integers; coverage is one division per output
    * row. Rank ties break on the term itself, the [[vocabTopK]]
    * convention. */
  def vocabCoverage(df: DataFrame, textCol: String,
                    topN: Int = 100, roundTo: Int = 6): DataFrame = {
    val toks = df.select(
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("freq"))
    val totRow = counts.agg(sum(col("freq"))).head()
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    require(total > 0, "vocabCoverage: empty corpus")
    val top = counts.orderBy(col("freq").desc, col("term")).limit(topN)
    // ≤ topN rows from here on: the bounded single-group window is the plan
    val w = Ranked.bounded(col("freq").desc, col("term"))
    top
      .withColumn("rank", row_number().over(w).cast("int"))
      .withColumn("cum_freq",
        sum(col("freq")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .select(col("rank"), col("term"), col("freq").cast("long").as("freq"),
        col("cum_freq"),
        TextFunctions.portableRound(
          col("cum_freq").cast("double") / lit(total.toDouble), roundTo)
          .as("coverage"))
  }

  /** Gini coefficient of token mass across groups — the one-number
    * "how concentrated is my training mix" report (0 = perfectly even
    * sources, →1 = one source holds everything). Governance dashboards
    * pair this with [[jsDivergence]]'s pairwise drift matrix.
    *
    * gini = Σᵢ (2i − n − 1)·xᵢ / (n·Σx) over groups ranked ascending by
    * token count (ties broken by group name). Everything stays exact
    * integer arithmetic until the single final division. The global
    * rank window runs over ONE ROW PER GROUP after a map-side-combined
    * aggregation — group cardinality (sources, languages, shards) is
    * small by construction, so the single-partition window is O(groups),
    * never O(rows). */
  def tokenGini(df: DataFrame, groupCol: String, textCol: String,
                roundTo: Int = 6): DataFrame = {
    val cnt = df.groupBy(col(groupCol).as("grp"))
      .agg(sum(TextFunctions.tokenCount(col(textCol))).cast("long")
        .as("tok"))
    val ranked = cnt.withColumn("i",
      row_number().over(Ranked.bounded(col("tok"), col("grp"))))
    ranked.agg(count(lit(1)).as("n_groups"),
        sum(col("tok")).cast("long").as("total_tok"),
        sum((lit(2) * col("i").cast("long") - lit(1)) * col("tok"))
          .cast("long").as("wsum"))
      .select(col("n_groups"), col("total_tok"),
        TextFunctions.portableRound(
          (col("wsum") - col("n_groups") * col("total_tok")).cast("double") /
            (col("n_groups") * col("total_tok")).cast("double"),
          roundTo).as("gini"))
  }

  /** Dunning log-likelihood (G²) keyness: for each group (source) and
    * token, how improbably OVER-represented the token is in that group
    * vs the rest of the corpus — the corpus-linguistics signature
    * vocabulary extractor (what makes a source sound like itself),
    * sharper than raw frequency ratios for rare words. G² =
    * 2·(a·ln(a/E_a) + b·ln(b/E_b)), a/b the group/rest counts, E the
    * expectations under a shared rate. Only over-represented tokens
    * rank (decided by the EXACT integer compare a·N > (a+b)·N_g);
    * zero-count terms contribute 0 via the standard x·ln x → 0 limit.
    * Top `k` per group by (G² desc, token).
    *
    * Determinism: a, b, N_g, N are exact longs shipped into one IEEE
    * ln tree; a bounded rank window over per-group survivors only
    * (the x44 discipline). Scale: one token aggregation by
    * (group, token) + a broadcast group-totals join. */
  def keynessG2(df: DataFrame, groupCol: String, textCol: String,
                k: Int = 5, roundTo: Int = 4): DataFrame = {
    val tc = df.select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("t"))
      .groupBy("grp", "t").agg(count(lit(1)).as("a"))
    val gTot = tc.groupBy("grp").agg(sum(col("a")).as("ng"))
    val tTot = tc.groupBy("t").agg(sum(col("a")).as("ab"))
    val nAll = broadcast(gTot.agg(sum(col("ng")).as("n")))
    val j = tc.join(broadcast(gTot), Seq("grp")).join(tTot, Seq("t"))
      .crossJoin(nAll)
      .withColumn("b", col("ab") - col("a"))
      .withColumn("nr", col("n") - col("ng"))
      // over-representation gate, exact: a/N_g > (a+b)/N
      .filter(col("a") * col("n") > col("ab") * col("ng"))
    def xlnx(x: Column, e: Column): Column =
      when(x === 0L, lit(0.0))
        .otherwise(x.cast("double") * log(x.cast("double") / e))
    val ea = col("ab").cast("double") * col("ng").cast("double") /
      col("n").cast("double")
    val eb = col("ab").cast("double") * col("nr").cast("double") /
      col("n").cast("double")
    val scored = j.select(col("grp"), col("t"), col("a"), col("b"),
      TextFunctions.portableRound(
        lit(2.0) * (xlnx(col("a"), ea) + xlnx(col("b"), eb)),
        roundTo).as("g2"))
    val w = Window.partitionBy("grp").orderBy(col("g2").desc, col("t"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Flesch–Kincaid grade level per document — the classic readability
    * gauge quality pipelines report next to [[CorpusStats.bigramBits]]
    * perplexity (too-low grade = fragment soup, absurdly high = legal
    * boilerplate). Words = the shared tokenizer; sentences = x157's
    * portable `[^.!?]+[.!?]*` segmentation; syllables ≈ vowel RUNS
    * (`[aeiouyAEIOUY]+`) — the standard regex approximation, exact on
    * both engines via the shared pattern constants. grade =
    * 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59; NULL
    * when a document has no words or no sentences (nothing to grade).
    * All three counts are exact integers from ONE scan-time pass. */
  def readability(df: DataFrame, idCol: String, textCol: String,
                  roundTo: Int = 4): DataFrame = {
    val words = TextFunctions.tokenCount(lower(col(textCol)))
    val sents = TextFunctions.regexCountPublic(col(textCol),
      "[^.!?]+[.!?]*")
    val syll = TextFunctions.regexCountPublic(col(textCol),
      "[aeiouyAEIOUY]+")
    df.select(col(idCol).as("doc_id"), words.as("n_words"),
        sents.cast("long").as("n_sentences"),
        syll.cast("long").as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        when(col("n_words") === 0L || col("n_sentences") === 0L,
          lit(null).cast("double"))
          .otherwise(TextFunctions.portableRound(
            lit(0.39) * col("n_words").cast("double") /
              col("n_sentences").cast("double") +
              lit(11.8) * col("n_syllables").cast("double") /
                col("n_words").cast("double") - lit(15.59) + lit(1000.0),
            roundTo).minus(lit(1000.0))).as("fk_grade"))
  }

  /** Marginal gram novelty per source — "which sources actually add
    * text the corpus doesn't already have": every distinct k-token
    * span is OWNED by its lexicographically-first source, and a
    * source's novelty is the fraction of its distinct spans it owns.
    * The deduplicated-acquisition view of the x189 source-similarity
    * matrix: a mirror site scores ~0 novelty no matter how big it is,
    * which is the number an acquisition budget should look at.
    * (Canonical name order makes the attribution deterministic; any
    * priority order — crawl date, quality — is one ORDER change.)
    *
    * Scale shape: one positional-gram fan-out (24-byte hashed rows,
    * the x43 class) → per-source DISTINCT (one shuffle) → a min-owner
    * aggregation on the distinct-gram table. Exact integers to one
    * rounded division.
    *
    * Returns (source, n_grams, n_novel, novelty), sources with no
    * k-span omitted (nothing to attribute). */
  def sourceNovelty(df: DataFrame, sourceCol: String, textCol: String,
                    k: Int = 8, roundTo: Int = 4): DataFrame = {
    require(k >= 1, s"span width must be >= 1, got $k")
    val base = df.select(col(sourceCol).as("source"),
        TextFunctions.tokens(col(textCol)).as("tk"))
      .withColumn("n_tok", size(col("tk")).cast("long"))
    // materialize the distinct-gram table ONCE: `per` and `nov` below
    // aggregate it on different keys, and the planner picks different
    // physical distincts for the two branches (hash vs sort-based), so
    // ReuseExchange does NOT cover the shared subtree — without the
    // checkpoint the whole scan+fan-out runs twice (the Spearman
    // fan-in lesson; PLANS showed two parquet scans for x233). The
    // materialized frame is the ALREADY-DEDUPED 24-byte hash table,
    // far smaller than the fan-out it replaces.
    // explode the POSITIONS first, then slice/concat/md5 as top-level
    // (codegen'd) expressions: the same work inside the transform
    // lambda ran through the Catalyst interpreter per position —
    // measured 2.0× the whole stage at sf1 (HofAudit, r15). Values
    // identical; whole-stage codegen fuses generate+project, so the
    // token array is a per-input-row reference, never copied per
    // position.
    val g = base.filter(col("n_tok") >= k)
      .select(col("source"), col("tk"),
        explode(sequence(lit(0), size(col("tk")) - k)).as("i"))
      .select(col("source"), TextFunctions.md5Hash60(
        concat_ws(" ", slice(col("tk"), col("i") + 1, lit(k)))).as("h"))
      .distinct()
      .localCheckpoint()
    val per = g.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val nov = g.groupBy("h").agg(min(col("source")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("n_novel"))
    per.join(nov, Seq("source"), "left")
      .select(col("source"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        TextFunctions.portableRound(
          coalesce(col("n_novel"), lit(0L)).cast("double") /
            col("n_grams").cast("double"), roundTo).as("novelty"))
      .orderBy("source")
  }

  /** Interpolated Kneser–Ney bigram bits per token — the STANDARD LM
    * smoothing ([[bigramBits]] ships add-1, the teaching baseline; KN
    * is what production n-gram scorers like KenLM actually run):
    *
    *   p(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *            + D·N₁₊(w₁•)/c(w₁·) · N₁₊(•w₂)/T
    *
    * with discount D, continuation counts N₁₊ (distinct followers /
    * predecessors) and T = distinct bigram types. The continuation
    * distribution is KN's point: a token seen often but only in ONE
    * context ("Francisco") stops inflating every unseen context the
    * way a raw unigram backoff would.
    *
    * Self-model (scored corpus = model corpus), so every scored bigram
    * exists in the model and all joins are exact inner joins; all four
    * model tables derive from ONE bigram-count aggregation (the joint
    * table is vocab²-bounded; marginal, follower and predecessor
    * counts are GROUP BYs over it, never second corpus passes — the
    * x88 lesson). Per-bigram-type log scores quantize to ×10⁸ longs
    * and weight by occurrence count, so the per-doc reduction is an
    * order-free map-side-combinable integer sum.
    *
    * Returns (doc_id, n_big, kn_bpt): bigram count and KN bits per
    * bigram, 0 for docs shorter than two tokens. */
  def kneserNeyBits(df: DataFrame, idCol: String, textCol: String,
                    discount: Double = 0.75,
                    roundTo: Int = 4): DataFrame = {
    require(discount > 0.0 && discount < 1.0, "discount must be in (0,1)")
    def hashed(src: DataFrame) = src.select(col(idCol).as("doc_id"),
      TextFunctions.hashedTokens(col(textCol)).as("hs"))
    def bigrams(src: DataFrame) = {
      val nb = greatest(size(col("hs")) - 1, lit(0))
      src.select(col("doc_id"),
          explode(zip_with(slice(col("hs"), lit(1), nb),
            slice(col("hs"), lit(2), nb),
            (a, b) => struct(a.as("h1"), b.as("h2")))).as("b"))
        .select(col("doc_id"), col("b.h1"), col("b.h2"))
    }
    val bg = bigrams(hashed(df))
    val c2 = bg.groupBy("h1", "h2").agg(count(lit(1)).as("c2"))
    // marginal + follower count from the joint table, one pass each
    val c1 = c2.groupBy("h1")
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val rv = c2.groupBy("h2").agg(count(lit(1)).as("n1r"))
    val tt = c2.agg(count(lit(1)).as("t"))
    val dc = bg.groupBy("doc_id", "h1", "h2").agg(count(lit(1)).as("c"))
    // one IEEE tree, identical shape in the oracle SQL:
    // (max(c2−D,0) + D·n1f·(n1r/T)) / c1
    val logQ = floor(log2(
      (greatest(col("c2").cast("double") - lit(discount), lit(0.0)) +
        lit(discount) * col("n1f").cast("double") *
          (col("n1r").cast("double") / col("t").cast("double"))) /
        col("c1").cast("double")) * lit(1e8) + lit(0.5)).cast("long")
    val per = dc.join(c2, Seq("h1", "h2")).join(c1, Seq("h1"))
      .join(rv, Seq("h2")).crossJoin(broadcast(tt))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_big"),
        sum(col("c") * logQ).as("tq"))
    val scored = per.select(col("doc_id"), col("n_big"),
      TextFunctions.portableRound(
        (lit(0.0) - col("tq").cast("double") / lit(1e8)) /
          col("n_big").cast("double"),
        roundTo).as("kn_bpt"))
    df.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("kn_bpt"), lit(0.0)).as("kn_bpt"))
  }

  /** Hill estimator of the tail index α over a positive long column —
    * the standard answer to "how heavy is the document-length tail?",
    * which decides whether a pipeline needs length caps / packing
    * slack (α ≤ 2: infinite variance, a few giants dominate shuffle
    * sizing; larger α: tails are tame). α = k / Σᵢ₌₁..k ln(x₍ᵢ₎/x₍ₖ₊₁₎)
    * over the k largest values; the sum telescopes to
    * Σ ln x over the top k+1 minus (k+1)·ln x₍ₖ₊₁₎, so NO per-rank
    * bookkeeping is needed — order-statistic values are deterministic
    * under ties even though row ranks are not.
    *
    * Scale shape: one TakeOrderedAndProject top-(k+1) (per-partition
    * heaps of k+1 rows, no global sort) + a 1-row aggregate. With
    * fewer than k+1 positive rows the estimator uses all n rows
    * (k_eff = n − 1, clamped to 0 — a frame with NO positive values
    * reports (k=0, x_k NULL, alpha NULL), not a k=−1 sentinel); a
    * degenerate tail (all sampled values equal) returns NULL α.
    * Output (single row): k, x_k, alpha. */
  def hillTail(df: DataFrame, valueCol: String, k: Int = 100,
               roundTo: Int = 4): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val top = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v") > 0)
      .orderBy(col("v").desc).limit(k + 1)
    val kEff = greatest(count(lit(1)) - lit(1L), lit(0L)).cast("long")
    val denom = sum(log(col("v").cast("double"))) -
      count(lit(1)).cast("double") * log(min(col("v")).cast("double"))
    // stability floor 1e-6, not a zero test: an all-equal tail leaves
    // the telescoped sum at ±(a few ulps), not exactly 0 — and ANY
    // denominator that small means alpha is float noise on every
    // engine, so both sides (this and the oracle SQL) report NULL
    top.agg(kEff.as("k"), min(col("v")).as("x_k"), denom.as("_d"))
      .select(col("k"), col("x_k"),
        when(col("_d") < 1e-6 || col("k") < 1L, lit(null).cast("double"))
          .otherwise(TextFunctions.portableRound(
            col("k").cast("double") / col("_d"), roundTo)).as("alpha"))
  }

  /** Sentence-level language segmentation: split each document with
    * the portable `[^.!?]+[.!?]*` pattern (the sentenceChunks
    * splitter), language-ID every sentence, and report per document
    * how MIXED it is — dominant language, distinct-language count, and
    * adjacent-sentence language switches. The within-doc complement of
    * doc-level langid (x04) and script mixing (x153): a
    * half-translated page or quote-heavy forum thread is exactly what
    * single-label langid mislabels, and segment counts are the filter
    * signal multilingual pipelines use (e.g. "drop docs whose dominant
    * language owns < 60% of sentences").
    *
    * Scale shape: one per-row fan-out (posexplode of the sentence
    * list), one doc-keyed window for the switch flags, two doc-keyed
    * aggregations — all partitioned by doc, no global state. Dominant
    * ties break (count desc, lang asc) deterministically.
    *
    * Returns (doc_id, n_seg, n_langs, dominant_lang, n_switches);
    * docs with no tokenized sentence emit nothing. */
  def langSegments(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val sents = df.select(col(idCol).as("doc_id"),
        posexplode(regexp_extract_all(col(textCol),
          lit("[^.!?]+[.!?]*"), lit(0))).as(Seq("sidx", "sent")))
      .filter(size(TextFunctions.tokens(col("sent"))) > 0)
      .withColumn("slang", TextFunctions.langId(col("sent")))
    val wDoc = Window.partitionBy("doc_id").orderBy("sidx")
    val flags = sents
      .withColumn("sw", when(lag(col("slang"), 1).over(wDoc).isNotNull &&
        lag(col("slang"), 1).over(wDoc) =!= col("slang"), 1L)
        .otherwise(0L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_seg"), sum(col("sw")).as("n_switches"))
    val perLang = sents.groupBy("doc_id", "slang")
      .agg(count(lit(1)).as("c"))
    val wDom = Window.partitionBy("doc_id")
      .orderBy(col("c").desc, col("slang").asc)
    val dom = perLang
      .withColumn("rn", row_number().over(wDom))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_langs"),
        max(when(col("rn") === 1, col("slang"))).as("dominant_lang"))
    flags.join(dom, Seq("doc_id"))
      .select(col("doc_id"), col("n_seg"), col("n_langs"),
        col("dominant_lang"), col("n_switches"))
  }
}
