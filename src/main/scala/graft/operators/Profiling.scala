package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Data-profiling operators: the distribution/correlation/outlier
  * dashboard a pipeline team reads before trusting a new drop — value
  * histograms, a Pearson matrix over quality signals, and robust
  * (median/MAD) outlier counts.
  *
  * Determinism doctrine (the house rules): counts and quantized values
  * stay exact integers through every aggregation; floats appear only in
  * final, fixed-order arithmetic on already-aggregated scalars, so no
  * result ever depends on partitioning or accumulation order.
  */
object Profiling {

  /** Equi-width histogram of a numeric column: `bins` buckets between
    * the observed min and max, empty buckets omitted. The classic
    * profiling pass — two scans (one tiny min/max agg, one binning
    * scan), both embarrassingly parallel; the per-row bin is pure
    * arithmetic on broadcast scalars, and the output is at most `bins`
    * rows at any data size.
    *
    * Bin edges: width = (max−min)/bins computed ONCE on the driver from
    * the exact aggregated doubles (both engines perform the same IEEE
    * division); the top edge closes (v = max lands in the last bin),
    * and a degenerate min = max column collapses to bin 0 rather than
    * dividing by zero. NULLs are ignored. */
  def valueHistogram(df: DataFrame, valCol: String,
                     bins: Int = 20, roundTo: Int = 6): DataFrame = {
    require(bins >= 1, "bins >= 1")
    val v = col(valCol).cast("double")
    val st = df.filter(v.isNotNull)
      .agg(min(v).as("mn"), max(v).as("mx"), count(lit(1)).as("n")).head()
    require(st.getLong(2) > 0, s"valueHistogram: no non-null $valCol")
    val mn = st.getDouble(0)
    val w = (st.getDouble(1) - mn) / bins
    val bin = if (w == 0.0) lit(0L)
      else least(floor((v - lit(mn)) / lit(w)), lit(bins - 1L)).cast("long")
    df.filter(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        TextFunctions.portableRound(lit(mn) + col("bin") * lit(w), roundTo)
          .as("lo"),
        TextFunctions.portableRound(lit(mn) + (col("bin") + 1) * lit(w),
          roundTo).as("hi"),
        col("n"))
  }

  /** Append a batch's QUANTIZED value counts to a versioned histogram
    * store — write-time-maintained distributions, the [[Sketches]]
    * `appendCms` discipline applied to quantiles: rows are
    * (grp, q, cnt) with q = floor(value·10^scale + 0.5) exact longs,
    * and counts are ADDITIVE, so element-wise summation of per-batch
    * grids equals the from-scratch histogram of the union — exactly,
    * under any batch split or append order — riding
    * [[MergeUpsert.mergeAdditiveWritePlain]]'s atomic publish.
    * State is O(distinct quantized values per group): bounded by the
    * value domain at the chosen scale, never by row count — the
    * monitoring-cadence alternative to re-scanning 100 TB for a
    * percentile dashboard. NULL values are excluded (nothing to rank).
    *
    * Idempotence is the caller's file-level exactly-once, as with
    * every additive sink (the x54/x131 contract). */
  def appendValueCounts(spark: org.apache.spark.sql.SparkSession,
                        storePath: String, df: DataFrame,
                        groupCol: String, valCol: String,
                        scale: Int = 4, retainVersions: Int = 2): Unit = {
    val grid = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("grp"),
        floor(col(valCol).cast("double") * lit(math.pow(10, scale))
          + lit(0.5)).cast("long").as("q"))
      .groupBy("grp", "q").agg(count(lit(1)).as("cnt"))
    MergeUpsert.mergeAdditiveWritePlain(spark, storePath,
      grid.coalesce(1), keys = Seq("grp", "q"), sumCols = Seq("cnt"),
      retainVersions)
  }

  /** Retention compaction of an [[appendValueCounts]] store: every
    * publish already folds the WHOLE histogram into the new version
    * (the store is state, not a delta log), so compaction is a pure
    * retention prune — drop published versions beyond the newest
    * `keepVersions`, live fold untouched, probes unchanged. At
    * monitoring cadence this is the pass that takes the store below
    * the publish path's 2-version floor once the in-flight-reader
    * window has drained (each retained version is a full histogram
    * copy; `keepVersions = 1` halves the store's footprint). Returns
    * the number of versions dropped; idempotent; the next append
    * publishes and merges against the live fold exactly as before. */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
                   storePath: String, keepVersions: Int = 1): Int =
    MergeUpsert.vacuumPlain(spark, storePath, keepVersions)

  /** Exact type-1 (lower order statistic) percentiles per group from
    * an [[appendValueCounts]] store: for each integer percent p, the
    * value is the smallest stored q whose cumulative count reaches
    * rank ⌈n·p/100⌉ — ALL rank arithmetic in exact longs
    * ((n·p + 99) div 100), so no float ceil can disagree between
    * engines; the returned value is q/10^scale, one IEEE division of
    * the same integers on any engine. The cumulative walk windows over
    * the store's per-group bucket rows (domain-bounded metadata, not
    * data); percents fan out via explode, no join against a literal
    * frame. Returns (grp, pct, n, value) ordered by (grp, pct). */
  def quantilesFromStore(store: DataFrame,
                         percents: Seq[Int] = Seq(25, 50, 75),
                         scale: Int = 4): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be integer percentiles in [1, 100], got $percents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("q")
    val cum = store.withColumn("cum", sum(col("cnt")).over(w))
    val tgt = store.groupBy("grp").agg(sum(col("cnt")).as("n"))
      .select(col("grp"), col("n"),
        explode(array(percents.map(p => lit(p)): _*)).as("pct"))
      .withColumn("r", expr("(n * pct + 99) div 100"))
    cum.join(tgt, "grp")
      .groupBy("grp", "pct", "n")
      .agg(min(when(col("cum") >= col("r"), col("q"))).as("qv"))
      .select(col("grp"), col("pct").cast("int").as("pct"),
        col("n").cast("long").as("n"),
        (col("qv").cast("double") / lit(math.pow(10, scale)))
          .as("value"))
      .orderBy("grp", "pct")
  }

  /** Pairwise Pearson correlation over the given numeric columns, in
    * ONE aggregation pass (n, Σx, Σx², Σxy for every pair), emitted as
    * one row per (col_a, col_b) pair with a < b.
    *
    * Order-independence: every input is fixed-point quantized
    * (×2^`qBits`, round-half-up) to a long FIRST — the
    * [[Similarity.centroidDrift]] recipe — so all sums are exact
    * integer arithmetic. Pearson is scale-invariant, so quantization
    * only bounds resolution (2⁻²⁰ by default), never biases r. The
    * final r is fixed-order double arithmetic on the aggregated
    * scalars. Long sums bound the scale: Σx·y < 2⁶³ requires
    * rows × Πpair(maxval·2^qBits) to fit — so quantization is PER
    * COLUMN (`qBitsFor`, falling back to `qBits`): integer-valued
    * columns take 0 extra bits, only genuine fractions pay for
    * resolution. Pearson's per-column scale invariance makes the mixed
    * scales free. At trillion-row scale lower the bits further or swap
    * the sums to DECIMAL(38,0) — the quantization makes either a
    * one-line change. */
  /** Benford first-digit audit of a numeric column: observed leading-
    * significant-digit distribution vs Benford's log₁₀(1 + 1/d), with
    * the χ² distance replicated per row — the classic "does this
    * metric column look organically generated or fabricated/bugged"
    * data-quality screen (synthetic defaults, unit mix-ups and
    * truncation bugs all bend the first-digit curve).
    *
    * Engine-exact digit extraction: |v| quantizes to ×10⁴ longs
    * (zeros carry no leading digit and are excluded, reported via
    * n_total vs Σn), and the first digit is pure INTEGER arithmetic —
    * q div 10^(digits(q)−1) with digits(q) = string length of a
    * BIGINT, identical in any engine (no float log10 at power-of-ten
    * boundaries). The nine expected shares are Scala-computed
    * literals interpolated into both sides. All nine digits are
    * reported (empty ones with n = 0 — they still contribute to χ²). */
  def benford(df: DataFrame, valCol: String,
              roundTo: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = floor(abs(col(valCol)) * lit(10000.0) + lit(0.5)).cast("long")
    val firstDigit = expr(
      "CAST(q DIV CAST(pow(10, length(CAST(q AS STRING)) - 1) AS BIGINT)" +
        " AS INT)")
    val counts = df.select(q.as("q")).filter(col("q") > 0L)
      .select(firstDigit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val expected = BenfordExpected.zipWithIndex
      .map { case (e, i) => (i + 1, e) }.toDF("digit", "expected_raw")
    val full = broadcast(expected).join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        col("expected_raw"))
    val tot = full.agg(sum(col("n")).as("nn"))
    // nn = 0 (no nonzero values at all) has no defined distance —
    // 0 per digit rather than an ANSI double-division abort
    val withChi = full.crossJoin(broadcast(tot))
      .withColumn("chi_raw",
        when(col("nn") === 0L, lit(0.0)).otherwise(
          (col("n").cast("double") - col("expected_raw") * col("nn").cast("double")) *
            (col("n").cast("double") - col("expected_raw") * col("nn").cast("double")) /
            (col("expected_raw") * col("nn").cast("double"))))
    val chi2 = withChi
      .agg(array_sort(collect_list(struct(col("digit"),
        col("chi_raw").as("w")))).as("arr"))
      .select(TextFunctions.portableRound(
        aggregate(col("arr"), lit(0.0), (acc, s) => acc + s.getField("w")),
        roundTo).as("chi2"))
    withChi.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n"), col("nn").as("n_nonzero"),
        TextFunctions.portableRound(
          when(col("nn") === 0L, lit(0.0))
            .otherwise(col("n").cast("double") / col("nn").cast("double")),
          roundTo).as("share"),
        TextFunctions.portableRound(col("expected_raw"), roundTo)
          .as("expected"),
        col("chi2"))
      .orderBy("digit")
  }

  /** Benford expected shares log₁₀(1 + 1/d), d = 1..9 — Scala-computed
    * once, interpolated as literals into BOTH engines' expressions so
    * no library log₁₀ ULP difference can ever split them. */
  val BenfordExpected: Seq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  def correlation(df: DataFrame, cols: Seq[String],
                  qBits: Int = 20, qBitsFor: Map[String, Int] = Map.empty,
                  roundTo: Int = 6): DataFrame = {
    require(cols.size >= 2 && cols.distinct == cols,
      "need >= 2 distinct columns")
    def xq(c: String): Column = {
      val q = (1L << qBitsFor.getOrElse(c, qBits)).toDouble
      floor(col(c).cast("double") * lit(q) + lit(0.5)).cast("long")
    }
    val quant = df.select(cols.map(c => xq(c).as(s"q_$c")): _*)
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.flatMap(c => Seq(
        sum(col(s"q_$c")).as(s"s_$c"),
        sum(col(s"q_$c") * col(s"q_$c")).as(s"ss_$c"))) ++
      cols.combinations(2).toSeq.map { case Seq(a, b) =>
        sum(col(s"q_$a") * col(s"q_$b")).as(s"sp_${a}_$b") }
    val row = quant.agg(aggs.head, aggs.tail: _*)
    val pairs = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      val n = col("n").cast("double")
      def d(c: Column) = c.cast("double")
      val num = n * d(col(s"sp_${a}_$b")) -
        d(col(s"s_$a")) * d(col(s"s_$b"))
      val va = n * d(col(s"ss_$a")) - d(col(s"s_$a")) * d(col(s"s_$a"))
      val vb = n * d(col(s"ss_$b")) - d(col(s"s_$b")) * d(col(s"s_$b"))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(va * vb > 0,
          TextFunctions.portableRound(num / sqrt(va * vb), roundTo))
          .otherwise(lit(0.0)).as("r"))
    }
    row.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.r"))
  }

  /** Robust outlier counts per group: median/MAD (median absolute
    * deviation) with a `k`·MAD fence — the outlier rule that survives
    * the outliers themselves (3σ fences don't: one huge value inflates
    * σ until nothing is an outlier).
    *
    * Values are fixed-point quantized (×2^`qBits`) to integers BEFORE
    * the percentiles: interpolating between integers ≤ 2⁴⁰ is EXACT in
    * doubles, so the median, the deviations (.5 steps), the MAD (.25
    * steps) and the k·MAD fence comparison are all exact arithmetic on
    * any engine — no ulp-boundary flips, the same reasoning as
    * [[Similarity.centroidDrift]].
    *
    * Two grouped EXACT percentile aggregations (per-group state is the
    * group's values — same trade as [[CorpusStats.lengthQuantiles]];
    * set `approx = true` to switch both to `percentile_approx` at
    * 100 TB, same plan shape) plus one broadcast-joined fence scan.
    * Output per group: n, median, mad (both de-quantized), n_outliers. */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
                  k: Double = 3.0, qBits: Int = 20,
                  approx: Boolean = false, roundTo: Int = 6): DataFrame = {
    val q = (1L << qBits).toDouble
    val vq = floor(col(valCol).cast("double") * lit(q) + lit(0.5))
      .cast("long")
    def p50(c: Column): Column =
      if (approx) percentile_approx(c, lit(0.5), lit(10000))
      else percentile(c, lit(0.5))
    val base = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("grp"), vq.as("vq"))
    val med = base.groupBy("grp").agg(p50(col("vq")).as("med"))
    val dev = base.join(broadcast(med), Seq("grp"))
      .select(col("grp"), col("med"),
        abs(col("vq").cast("double") - col("med")).as("dv"))
    val mad = dev.groupBy("grp").agg(p50(col("dv")).as("mad"))
    dev.join(broadcast(mad), Seq("grp"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med_"),
        max(col("mad")).as("mad_"),
        sum(when(col("dv") > lit(k) * col("mad"), 1L).otherwise(0L))
          .cast("long").as("n_outliers"))
      .select(col("grp").as(groupCol), col("n"),
        TextFunctions.portableRound(col("med_") / lit(q), roundTo)
          .as("median"),
        TextFunctions.portableRound(col("mad_") / lit(q), roundTo)
          .as("mad"),
        col("n_outliers"))
  }

  /** Engine-portable rounding for values that may be NEGATIVE:
    * portableRound's floor(x·10⁴+0.5) is a round-toward-+∞ half rule,
    * so shifting by a constant keeps the same rule on both sides of
    * zero and both engines (the zipfFit beta recipe). */
  private def roundSigned(c: Column, n: Int): Column =
    TextFunctions.portableRound(c + lit(1000.0), n) - lit(1000.0)

  /** Mann–Kendall trend test + Theil–Sen slope per series — the
    * nonparametric "is this metric drifting" monitor for pipeline
    * telemetry (daily volumes, rejection rates): S = Σ_{i<j}
    * sign(xⱼ−xᵢ) with the tie-corrected variance, and the slope
    * estimate the median of all pairwise slopes — both robust to
    * outliers and any monotone transform, unlike a least-squares fit
    * on the same series.
    *
    * Input: one row per (series, time, value). The pairwise stage is
    * O(points²) PER SERIES — sound at any corpus size because a time
    * series' length is bounded by the calendar, not the data volume;
    * the corpus-scale work is whatever aggregation PRODUCED the series
    * (the caller's one groupBy).
    *
    * Determinism: S, the tie counts and var18 = n(n−1)(2n+5) −
    * Σ_t t(t−1)(2t+5) are exact integers; each pairwise slope is ONE
    * IEEE division; the median is an order statistic under a total
    * order (slope, t₁, t₂); z = (S∓1)/√(var18/18) is fixed-order
    * scalar arithmetic, signed-rounded last. The trend label derives
    * from the QUANTIZED z so both engines label identically.
    *
    * Output: (series, n_points, n_pairs, s_stat, var18, z, sen_slope,
    * trend ∈ {increasing, decreasing, flat} at |z| > 1.96). */
  def trendTest(df: DataFrame, seriesCol: String, timeCol: String,
                valueCol: String, roundTo: Int = 4): DataFrame = {
    val pts = df.select(col(seriesCol).as("series"),
      col(timeCol).cast("long").as("t"),
      col(valueCol).cast("long").as("x"))
    val a = pts.as("a"); val b = pts.as("b")
    val pairs = a.join(b,
        col("a.series") === col("b.series") && col("a.t") < col("b.t"))
      .select(col("a.series").as("series"),
        col("a.t").as("t1"), col("b.t").as("t2"),
        when(col("b.x") > col("a.x"), lit(1L))
          .when(col("b.x") < col("a.x"), lit(-1L)).otherwise(lit(0L))
          .as("sgn"),
        ((col("b.x") - col("a.x")).cast("double") /
          (col("b.t") - col("a.t")).cast("double")).as("slope"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("series")
    val med = pairs
      .withColumn("rn", row_number().over(
        w.orderBy(col("slope"), col("t1"), col("t2"))))
      .withColumn("m", count(lit(1)).over(w))
      .filter(col("rn") === expr("(m + 1) DIV 2"))
      .select(col("series"), col("slope").as("sen_raw"))
    val sAgg = pairs.groupBy("series")
      .agg(sum(col("sgn")).as("s_stat"), count(lit(1)).as("n_pairs"))
    val nDays = pts.groupBy("series").agg(count(lit(1)).as("n_points"))
    val ties = pts.groupBy("series", "x").agg(count(lit(1)).as("tc"))
      .groupBy("series")
      .agg(sum(col("tc") * (col("tc") - 1) * (lit(2) * col("tc") + 5))
        .as("tie_corr"))
    val joined = nDays.join(sAgg, Seq("series"))
      .join(ties, Seq("series")).join(med, Seq("series"))
      .withColumn("var18",
        col("n_points") * (col("n_points") - 1) *
          (lit(2) * col("n_points") + 5) - col("tie_corr"))
    val z = when(col("var18") <= 0L || col("s_stat") === 0L, lit(0.0))
      .otherwise((col("s_stat").cast("double") -
        when(col("s_stat") > 0L, lit(1.0)).otherwise(lit(-1.0))) /
        sqrt(col("var18").cast("double") / lit(18.0)))
    joined
      .withColumn("z", roundSigned(z, roundTo))
      .select(col("series").as(seriesCol), col("n_points"),
        col("n_pairs"), col("s_stat"), col("var18"), col("z"),
        roundSigned(col("sen_raw"), roundTo).as("sen_slope"),
        when(col("z") > 1.96, lit("increasing"))
          .when(col("z") < -1.96, lit("decreasing"))
          .otherwise(lit("flat")).as("trend"))
      .orderBy(seriesCol)
  }

  /** Leave-one-group-out influence of each source on a corpus-level
    * mean (delete-a-group jackknife, Tukey/Quenouille): for every
    * group, the metric recomputed WITHOUT it — "which single source is
    * dragging my corpus quality score", answered exactly from one
    * aggregation because a mean's LOO values are algebra on the group
    * sums (θ₍ₕ₎ = (S−Sₕ)/(N−Nₕ)), never g re-scans. The jackknife
    * standard error over the g LOO estimates calibrates whether an
    * influence is signal or just group-size noise.
    *
    * Determinism: the metric column must be 1e-4-quantized (the
    * classifier-probability contract), so group sums are exact longs;
    * each LOO mean quantizes to a ×10⁸ long; deviations use the
    * n-scaling trick (g·tqₕ − Σtq, exact), squared into DECIMAL. One
    * groupBy + scalar cross joins — group-cardinality frames
    * throughout.
    *
    * Output per group: (group, n_docs, loo_mean, influence = loo −
    * global, mean, jk_se) with mean/jk_se replicated (dashboard
    * shape). Requires ≥ 2 groups. */
  def sourceInfluence(df: DataFrame, groupCol: String, probCol: String,
                      roundTo: Int = 4): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val sc = df.select(col(groupCol).as("grp"),
      floor(col(probCol) * lit(10000.0) + lit(0.5)).cast("long").as("pq"))
    val per = sc.groupBy("grp")
      .agg(count(lit(1)).as("n_docs"), sum(col("pq")).as("sh"))
    val tot = per.agg(sum(col("n_docs")).as("nn"), sum(col("sh")).as("ss"),
      count(lit(1)).as("g"))
    val lo = per.crossJoin(broadcast(tot))
      .withColumn("tq", floor(
        (col("ss") - col("sh")).cast("double") /
          (col("nn") - col("n_docs")).cast("double") * lit(10000.0) +
          lit(0.5)).cast("long"))
      .withColumn("thq", floor(
        col("ss").cast("double") / col("nn").cast("double") *
          lit(10000.0) + lit(0.5)).cast("long"))
    val t2 = lo.agg(sum(col("tq")).as("tt"))
    val withT = lo.crossJoin(broadcast(t2))
    // deviations cast to DECIMAL BEFORE squaring: g·tq can reach ~g·10⁸,
    // so the square overflows a long once g passes ~95 groups
    val devD = (col("g") * col("tq") - col("tt")).cast(dec)
    val jk = withT.agg(max(col("g")).as("g2"),
        sum(devD * devD).as("sd2"))
      .select(TextFunctions.portableRound(
        sqrt((col("g2") - 1).cast("double") * col("sd2").cast("double") /
          (col("g2").cast("double") * col("g2").cast("double") *
            col("g2").cast("double"))) / lit(1.0e8), 6).as("jk_se"))
    withT.crossJoin(broadcast(jk))
      .select(col("grp").as(groupCol), col("n_docs"),
        TextFunctions.portableRound(
          col("tq").cast("double") / lit(1.0e8), roundTo).as("loo_mean"),
        TextFunctions.portableRound(
          (col("tq") - col("thq")).cast("double") / lit(1.0e8) +
            lit(1000.0), roundTo).minus(lit(1000.0)).as("influence"),
        TextFunctions.portableRound(
          col("thq").cast("double") / lit(1.0e8), roundTo).as("mean"),
        col("jk_se"))
      .orderBy(groupCol)
  }

  /** Weekday-seasonality anomaly flags per daily series — the
    * calendar-aware complement to [[autocorrelation]] (which detects
    * that a weekly cycle exists; this says which days BREAK it): each
    * day's count is compared to its own weekday's mean for the series,
    * flagged when it deviates by more than half the expected level.
    * Weekday = epoch-day mod 7 (epoch-aligned index — deterministic
    * with no calendar library on either engine; day 0 = a Thursday).
    *
    * The flag compare is EXACT integers: |x − s/n| > (s/n)/2 ⟺
    * |2·x·n − 2·s| > s with s = weekday sum, n = weekday day-count —
    * no rounded threshold can flip a boundary day between engines.
    * One daily aggregation + one weekday aggregation + a keyed join;
    * all frames calendar-bounded.
    *
    * Output: (series, t, weekday, x, expected, flagged) — every day,
    * flag set on the breakers. */
  def weekdayAnomaly(df: DataFrame, seriesCol: String, timeCol: String,
                     valueCol: String, roundTo: Int = 4): DataFrame = {
    val pts = df.select(col(seriesCol).as("series"),
        col(timeCol).cast("long").as("t"),
        col(valueCol).cast("long").as("x"))
      .withColumn("weekday", pmod(col("t"), lit(7L)))
    val wd = pts.groupBy("series", "weekday")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("nw"))
    pts.join(wd, Seq("series", "weekday"))
      .select(col("series").as(seriesCol), col("t"), col("weekday"),
        col("x"),
        TextFunctions.portableRound(
          col("s").cast("double") / col("nw").cast("double"), roundTo)
          .as("expected"),
        (abs(lit(2L) * col("x") * col("nw") - lit(2L) * col("s")) >
          col("s")).as("flagged"))
      .orderBy(seriesCol, "t")
  }

  /** Dependence report for two categorical columns — chi-square
    * independence statistic, Cramér's V effect size, and mutual
    * information in bits, from ONE contingency aggregation: the "is
    * my quality gate confounded with source" audit (a strong
    * dependence means per-source mixing decisions and quality
    * filtering are double-counting the same signal).
    *
    * Exactness: with Oᵢⱼ·N and Rᵢ·Cⱼ exact (DECIMAL — the products
    * overflow longs at ~10⁹ rows), each chi² term is
    * (OᵢⱼN − RᵢCⱼ)²/(N·Rᵢ·Cⱼ) with integer numerator/denominator cast
    * once to double, quantized ×10⁶ before the order-free sum; MI
    * terms Oᵢⱼ·log₂(OᵢⱼN/RᵢCⱼ) quantize the log (one IEEE tree) ×10⁸
    * and weight by the exact count. Cells with Oᵢⱼ = 0 contribute 0
    * to MI and (RᵢCⱼ)/N·… to chi² via the grid join.
    *
    * Output (one row): n, r_levels, c_levels, dof, chi2, cramers_v,
    * mi_bits. */
  def dependenceReport(df: DataFrame, aCol: String, bCol: String,
                       roundTo: Int = 4): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val keyed = df.select(col(aCol).cast("string").as("a"),
      col(bCol).cast("string").as("b"))
    val cells = keyed.groupBy("a", "b").agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("a").agg(sum(col("o")).as("r"))
    val cols = cells.groupBy("b").agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("nn"))
    // full r×c grid so empty cells still carry their expected mass
    val grid = rows.crossJoin(broadcast(cols))
      .join(cells, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("r"), col("c"),
        coalesce(col("o"), lit(0L)).as("o"))
      .crossJoin(broadcast(tot))
    val num = (col("o").cast(dec) * col("nn").cast(dec) -
      col("r").cast(dec) * col("c").cast(dec))
    val den = (col("nn").cast(dec) * col("r").cast(dec) *
      col("c").cast(dec)).cast("double")
    val chiTq = floor((num * num).cast("double") / den * lit(1.0e6) +
      lit(0.5)).cast("long")
    val miLogQ = floor(log2(
      (col("o").cast(dec) * col("nn").cast(dec)).cast("double") /
        (col("r").cast(dec) * col("c").cast(dec)).cast("double")) *
      lit(1.0e8) + lit(0.5)).cast("long")
    val miTq = when(col("o") === 0L, lit(0L))
      .otherwise(col("o") * miLogQ).cast(dec)
    val withTerms = grid
      .withColumn("chi_tq", chiTq).withColumn("mi_tq", miTq)
      .agg(max(col("nn")).as("n"),
        count_distinct(col("a")).as("r_levels"),
        count_distinct(col("b")).as("c_levels"),
        sum(col("chi_tq")).as("chi_q"), sum(col("mi_tq")).as("mi_q"))
    val chi2d = col("chi_q").cast("double") / lit(1.0e6)
    val minDim = least(col("r_levels") - 1, col("c_levels") - 1)
    withTerms.select(col("n"), col("r_levels"), col("c_levels"),
      ((col("r_levels") - 1) * (col("c_levels") - 1)).as("dof"),
      TextFunctions.portableRound(chi2d, roundTo).as("chi2"),
      when(minDim <= 0L, lit(0.0))
        .otherwise(TextFunctions.portableRound(
          sqrt(chi2d / (col("n") * minDim).cast("double")), roundTo))
        .as("cramers_v"),
      TextFunctions.portableRound(
        col("mi_q").cast("double") / lit(1.0e8) /
          col("n").cast("double") + lit(1000.0), roundTo)
        .minus(lit(1000.0)).as("mi_bits"))
  }

  /** Pettitt changepoint test per series — WHERE the level shifted,
    * completing the drift suite ([[trendTest]] says whether a monotone
    * drift exists; PSI/KS compare two known windows; Pettitt finds the
    * unknown split point): Uₜ = Σ_{i≤t} Σ_j sign(xᵢ − xⱼ) via the
    * rank-based recurrence Uₜ = Uₜ₋₁ + Vₜ, Vₜ = Σⱼ sign(xₜ − xⱼ); the
    * change point is the t maximizing |Uₜ| (smallest t on ties) and
    * the approximate significance is p ≈ min(1, 2·exp(−6K²/(T³+T²))).
    *
    * V needs one O(points²)-per-series self-join — calendar-bounded
    * like [[trendTest]], never corpus-bounded — then a per-series
    * cumulative window over ≤points rows. S, V, U, K exact integers;
    * p is one fixed-order scalar expression, quantized to 1e-6 before
    * the significance compare so both engines decide identically.
    *
    * Output: (series, n_points, k_stat, t_hat, p_value, significant). */
  def changepointTest(df: DataFrame, seriesCol: String, timeCol: String,
                      valueCol: String): DataFrame = {
    val pts = df.select(col(seriesCol).as("series"),
      col(timeCol).cast("long").as("t"),
      col(valueCol).cast("long").as("x"))
    val a = pts.as("a"); val b = pts.as("b")
    val v = a.join(b, col("a.series") === col("b.series"))
      .groupBy(col("a.series").as("series"), col("a.t").as("t"))
      .agg(sum(when(col("a.x") > col("b.x"), lit(1L))
        .when(col("a.x") < col("b.x"), lit(-1L)).otherwise(lit(0L)))
        .as("v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("series")
    val u = v
      .withColumn("u", sum(col("v")).over(w.orderBy("t")))
      .withColumn("n_points", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(
        w.orderBy(abs(col("u")).desc, col("t"))))
      .filter(col("rn") === 1)
    val nd = col("n_points").cast("double")
    val p = least(lit(1.0), lit(2.0) * exp(lit(-6.0) *
      abs(col("u")).cast("double") * abs(col("u")).cast("double") /
      (nd * nd * nd + nd * nd)))
    u.select(col("series").as(seriesCol), col("n_points"),
        abs(col("u")).as("k_stat"), col("t").as("t_hat"),
        TextFunctions.portableRound(p, 6).as("p_value"))
      .withColumn("significant", col("p_value") <= 0.05)
      .orderBy(seriesCol)
  }

  /** Trimmed mean of a 1e-4-quantized score per group — the robust
    * location estimate for quality dashboards (a handful of 0.0-score
    * crawl failures or 1.0-score spam shouldn't move a source's
    * reported quality): drop the ⌊n·num/den⌋ lowest and highest
    * values, average the middle. Computed EXACTLY from the per-group
    * score histogram — each bucket contributes the overlap of its
    * cumulative span with the kept rank interval (k, n−k], so there is
    * no per-row sort, no order statistics over raw rows, and the
    * window runs over ≤10⁴ distinct quantized scores per group at any
    * corpus size (the x183 route). Integer arithmetic to one final
    * division.
    *
    * Output: (group, n, k_trim, n_kept, trimmed_mean, raw_mean). */
  def trimmedMean(df: DataFrame, groupCol: String, probCol: String,
                  trimNum: Int = 1, trimDen: Int = 20,
                  roundTo: Int = 4): DataFrame = {
    require(trimNum >= 0 && trimDen >= 1 && 2 * trimNum < trimDen,
      "trim fraction must be in [0, 1/2)")
    val sc = df.select(col(groupCol).as("grp"),
      floor(col(probCol) * lit(10000.0) + lit(0.5)).cast("long").as("pq"))
    val per = sc.groupBy("grp", "pq").agg(count(lit(1)).as("cn"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val cum = per
      .withColumn("cb", coalesce(sum(col("cn")).over(w.orderBy("pq")
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          -1)), lit(0L)))
      .withColumn("n", sum(col("cn")).over(w))
      .withColumn("s1", sum(col("pq") * col("cn")).over(w))
      .withColumn("k", expr(s"(n * $trimNum) DIV $trimDen"))
    val kept = greatest(lit(0L),
      least(col("cb") + col("cn"), col("n") - col("k")) -
        greatest(col("cb"), col("k")))
    cum.groupBy("grp")
      .agg(max(col("n")).as("n"), max(col("k")).as("k_trim"),
        sum(kept).as("n_kept"),
        sum(col("pq") * kept).as("tsum"), max(col("s1")).as("s1"))
      .select(col("grp").as(groupCol), col("n"), col("k_trim"),
        col("n_kept"),
        when(col("n_kept") === 0L, lit(0.0))
          .otherwise(TextFunctions.portableRound(
            col("tsum").cast("double") /
              (col("n_kept").cast("double") * lit(10000.0)), roundTo))
          .as("trimmed_mean"),
        TextFunctions.portableRound(
          col("s1").cast("double") / (col("n").cast("double") *
            lit(10000.0)), roundTo).as("raw_mean"))
      .orderBy(groupCol)
  }

  /** Sample autocorrelation of a series at lags 1..maxLag — the
    * seasonality/burst detector next to [[trendTest]]'s monotone
    * drift: r_k = Σ(xₜ−x̄)(xₜ₊ₖ−x̄) / Σ(xₜ−x̄)² over positions t in
    * observation order (gaps compressed, the standard sample-ACF
    * convention for regularly aggregated series).
    *
    * Exactness: with integer-valued points, the mean never appears as
    * a float — every deviation is scaled by n (yₜ = n·xₜ − Σx, exact
    * long), so numerator and denominator are EXACT integer sums whose
    * n² factors cancel in the ratio; one IEEE division per lag,
    * signed-rounded last. Per-series products are bounded by series
    * length (calendar), never corpus size.
    *
    * Output: (series, lag, n_points, acf), lags with no pairs omitted. */
  def autocorrelation(df: DataFrame, seriesCol: String, timeCol: String,
                      valueCol: String, maxLag: Int = 5,
                      roundTo: Int = 4): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val pts = df.select(col(seriesCol).as("series"),
      col(timeCol).cast("long").as("t"),
      col(valueCol).cast("long").as("x"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("series")
    val scaled = pts
      .withColumn("rn", row_number().over(w.orderBy("t")))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .select(col("series"), col("rn"), col("n"),
        (col("n") * col("x") - col("sx")).as("y"))
    val den = scaled.groupBy("series")
      .agg(sum(col("y") * col("y")).as("den"),
        max(col("n")).as("n_points"))
    val lags = (1 to maxLag).map(lit(_))
    val a = scaled.withColumn("lag", explode(array(lags: _*)))
      .select(col("series"), col("rn"), col("y"), col("lag")).as("a")
    val b = scaled.select(col("series"), col("rn"), col("y").as("yb")).as("b")
    val num = a
      .join(b, col("a.series") === col("b.series") &&
        col("a.rn") + col("a.lag") === col("b.rn"))
      .groupBy(col("a.series").as("series"), col("a.lag").as("lag"))
      .agg(sum(col("a.y") * col("yb")).as("num"))
    num.join(broadcast(den), Seq("series"))
      .select(col("series").as(seriesCol), col("lag"), col("n_points"),
        roundSigned(when(col("den") === 0L, lit(0.0))
          .otherwise(col("num").cast("double") / col("den").cast("double")),
          roundTo).as("acf"))
      .orderBy(seriesCol, "lag")
  }
}
