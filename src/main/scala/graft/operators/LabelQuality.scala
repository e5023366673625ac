package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions

/** Label-quality analytics for training-data curation: agreement
  * between noisy labelers (Cohen's κ), calibration of the quality
  * classifier against a rule-based truth (reliability bins + ECE), and
  * drift between corpus snapshots (PSI). These are the QC dashboards a
  * labeling/filtering pipeline runs BEFORE trusting its labels — the
  * reference's dashboard-analytics surface generalized to label ops
  * (frontend/public/dashboard.html:328-602 is the same shape: grouped
  * counts + one derived scalar).
  *
  * Determinism discipline (the x67/x106 recipe): every aggregate sums
  * EXACT integers (labels are 0/1; probabilities are pre-quantized
  * 1e-4 multiples, so ×10⁴ is an exact long); floats appear only in
  * final single-expression divisions, and any cross-row float fold
  * runs over a key-sorted bounded list. All three ops are one or two
  * map-side-combined aggregations — no windows over unbounded
  * partitions, no driver loops.
  */
object LabelQuality {

  /** Cohen's κ between two boolean annotator columns: one exact-integer
    * aggregation to the 2×2 confusion table, then κ from the table.
    * Output (single row): n, n11, n00, n10, n01, po, pe, kappa.
    *
    * Scale shape: a full-corpus map-side-combined count — the cheapest
    * query class in the engine. κ is the standard "are my two noisy
    * labelers actually measuring the same thing" gate before
    * Snorkel-style vote aggregation (x165) is trusted. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String,
                 roundTo: Int = 4): DataFrame = {
    val a = col(aCol).cast("int").cast("long")
    val b = col(bCol).cast("int").cast("long")
    val tab = df.select(a.as("a"), b.as("b"))
      .agg(count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"))
    val n = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / n
    // chance agreement from the marginals — each product is exact in
    // Int64 (n ≤ 2^31 rows keeps n_x·n_y < 2^62), one final division
    val pe = (((col("n11") + col("n10")) * (col("n11") + col("n01")))
      .cast("double") +
      ((col("n00") + col("n01")) * (col("n00") + col("n10")))
        .cast("double")) / (n * n)
    tab.select(col("n"), col("n11"), col("n00"), col("n10"), col("n01"),
      TextFunctions.portableRound(po, roundTo).as("po"),
      TextFunctions.portableRound(pe, roundTo).as("pe"),
      // κ ∈ [−1, 1]: the +1000 shift keeps portableRound in its
      // positive domain (the zipfFit slope discipline)
      TextFunctions.portableRound(
        when(pe === lit(1.0), lit(0.0))
          .otherwise((po - pe) / (lit(1.0) - pe)) + lit(1000.0), roundTo)
        .minus(lit(1000.0)).as("kappa"))
  }

  /** Reliability diagram + expected calibration error for a
    * probability column against a boolean truth column. Probabilities
    * MUST already be 1e-4 multiples (everything
    * [[TextFunctions.classifierProb]]-shaped is) — the per-bin mean
    * then sums exact longs, so aggregation order cannot move it.
    * Output: one row per non-empty bin (bin, n, n_pos, mean_prob,
    * frac_pos, gap) with the corpus ECE replicated on each row (the
    * x170 per-row-plus-scalar shape).
    *
    * Scale shape: one hash aggregation to ≤ `bins` rows, then a
    * bounded fold over the bin-sorted list for ECE. */
  def calibrationReport(df: DataFrame, probCol: String, labelCol: String,
                        bins: Int = 10, roundTo: Int = 4): DataFrame = {
    require(bins >= 2, "calibration needs at least 2 bins")
    val pq = floor(col(probCol) * lit(10000.0) + lit(0.5)).cast("long")
    val bin = least(floor(col(probCol) * lit(bins)).cast("int"),
      lit(bins - 1))
    val per = df.select(bin.as("bin"), pq.as("pq"),
        col(labelCol).cast("int").cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("pq")).as("spq"),
        sum(col("y")).as("n_pos"))
    val rows = per.select(col("bin"), col("n"), col("n_pos"),
        TextFunctions.portableRound(
          col("spq").cast("double") / (col("n").cast("double") * lit(10000.0)),
          roundTo).as("mean_prob"),
        TextFunctions.portableRound(
          col("n_pos").cast("double") / col("n").cast("double"), roundTo)
          .as("frac_pos"))
      .withColumn("gap",
        TextFunctions.portableRound(abs(col("mean_prob") - col("frac_pos")),
          roundTo))
    // ECE = Σ (n_b/N)·gap_b — folded in bin order over ≤ bins elements
    val ece = rows
      .agg(sum(col("n")).as("nn"),
        array_sort(collect_list(struct(col("bin"),
          (col("n").cast("double") * col("gap")).as("w")))).as("arr"))
      .select(TextFunctions.portableRound(
        aggregate(col("arr"), lit(0.0), (acc, s) => acc + s.getField("w"))
          / col("nn").cast("double"), roundTo).as("ece"))
    rows.crossJoin(broadcast(ece)).orderBy("bin")
  }

  /** Fleiss' κ for `raters` binary annotators: chance-corrected
    * agreement when MORE than two labelers vote ([[cohenKappa]]'s
    * n-rater generalization — the gate on whether x165-style vote
    * ensembles agree beyond chance). Input: a column with the
    * number of YES votes per item (0..raters).
    *
    * One exact-integer aggregation: per-item agreement numerator
    * k(k−1) + (r−k)(r−1−k) summed as longs, vote mass summed as
    * longs; P̄, P̄e and κ are three final float expressions. Output
    * (single row): n_items, n0..nR vote-distribution counts, p_yes,
    * p_bar, p_e, kappa. */
  def fleissKappa(df: DataFrame, yesCol: String,
                  raters: Int = 3, roundTo: Int = 4): DataFrame = {
    require(raters >= 2, "fleiss needs >= 2 raters")
    val r = raters.toLong
    val k = col(yesCol).cast("long")
    val aggCols: Seq[Column] =
      Seq(count(lit(1)).as("n"),
        sum(col("k") * (col("k") - lit(1L)) +
          (lit(r) - col("k")) * (lit(r) - lit(1L) - col("k")))
          .as("agree_num"),
        sum(col("k")).as("yes_sum")) ++
        (0 to raters).map(i =>
          sum(when(col("k") === i.toLong, lit(1L)).otherwise(lit(0L)))
            .as(s"n$i"))
    val agg = df.select(k.as("k")).agg(aggCols.head, aggCols.tail: _*)
    val n = col("n").cast("double")
    val pBar = col("agree_num").cast("double") /
      (n * lit((r * (r - 1)).toDouble))
    val pYes = col("yes_sum").cast("double") / (n * lit(r.toDouble))
    val pE = pYes * pYes + (lit(1.0) - pYes) * (lit(1.0) - pYes)
    agg.select((Seq(col("n").as("n_items")) ++
      (0 to raters).map(i => col(s"n$i")) ++
      Seq(
        TextFunctions.portableRound(pYes, roundTo).as("p_yes"),
        TextFunctions.portableRound(pBar, roundTo).as("p_bar"),
        TextFunctions.portableRound(pE, roundTo).as("p_e"),
        TextFunctions.portableRound(
          when(pE === lit(1.0), lit(0.0))
            .otherwise((pBar - pE) / (lit(1.0) - pE)) + lit(1000.0),
          roundTo).minus(lit(1000.0)).as("kappa"))): _*)
  }

  /** Krippendorff's α for `raters` binary annotators — the third
    * member of the agreement family ([[cohenKappa]] two raters,
    * [[fleissKappa]] n raters with a per-rater chance model): α uses
    * the pooled JUDGMENT distribution as its chance model, which makes
    * it the one that generalizes to missing data and other metrics.
    * Input: a column with the number of YES votes per item (0..r).
    *
    * α = 1 − D_o/D_e with
    *   D_o = Σᵢ 2·kᵢ(r−kᵢ) / (n·r·(r−1))   (observed pair disagreement)
    *   D_e = 2·Y·(N−Y) / (N·(N−1))          (expected; N = n·r, Y = Σk)
    * — both one division from exact long sums (the Fleiss pattern),
    * so the only float work is two divisions and the final ratio.
    * Output (single row): n_items, n_judgments, n_yes, d_o, d_e,
    * alpha. Degenerate N ≤ 1 or D_e = 0 (all judgments identical)
    * reports α = 1 when D_o = 0, else 0 — never a division error. */
  def krippendorffAlpha(df: DataFrame, yesCol: String,
                        raters: Int = 3, roundTo: Int = 4): DataFrame = {
    require(raters >= 2, "krippendorff needs >= 2 raters")
    val r = raters.toLong
    val k = col(yesCol).cast("long")
    val agg = df.select(k.as("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("y"),
        sum(col("k") * (lit(r) - col("k"))).as("dis"))
    val n = col("n").cast("double")
    val bigN = col("n") * lit(r)
    val dOf = lit(2.0) * col("dis").cast("double") /
      (n * lit((r * (r - 1)).toDouble))
    val dEf = lit(2.0) * col("y").cast("double") *
      (bigN - col("y")).cast("double") /
      (bigN.cast("double") * (bigN - lit(1L)).cast("double"))
    agg.select(
      col("n").as("n_items"),
      bigN.as("n_judgments"),
      col("y").as("n_yes"),
      TextFunctions.portableRound(dOf, roundTo).as("d_o"),
      TextFunctions.portableRound(dEf, roundTo).as("d_e"),
      TextFunctions.portableRound(
        when(col("n") * lit(r) <= 1L || dEf === lit(0.0),
          when(dOf === lit(0.0), lit(1.0)).otherwise(lit(0.0)))
          .otherwise(lit(1.0) - dOf / dEf) + lit(1000.0),
        roundTo).minus(lit(1000.0)).as("alpha"))
  }

  /** Kolmogorov–Smirnov statistic between two snapshots over a score
    * column — the nonparametric sibling of [[psiDrift]] (PSI needs
    * bins and a smoothing choice; KS is binless: the max ECDF gap).
    * EXACT: the maximized quantity is the integer
    * |cum_a·n_b − cum_b·n_a| over the ≤10⁴+1 distinct quantized
    * scores, so the argmax (smallest score on ties) is decided by
    * integer compares and the single division happens once, after.
    * Output (single row): n_a, n_b, ks, at_value.
    *
    * Scale: the x174 two-level prefix discipline — per-bucket windows
    * + bucket-totals join, never a single-partition window. The
    * cross products cum·n stay in Int64 for n ≤ 3e9 per side; cast
    * to DECIMAL here anyway (the Pca lesson, corpus sizes lie). */
  def ksDrift(df: DataFrame, sideCol: String, probCol: String,
              roundTo: Int = 4): DataFrame = {
    val dec = DecimalType(38, 0)
    val sc = df.select(
      floor(col(probCol) * lit(10000.0) + lit(0.5)).cast("long").as("pq"),
      col(sideCol).cast("long").as("s"))
    val per = sc.groupBy("pq")
      .agg(sum(lit(1L) - col("s")).as("ca"), sum(col("s")).as("cb"))
      .withColumn("b", (col("pq") / lit(1000L)).cast("int"))
    val wIncl = Window.partitionBy("b").orderBy("pq")
      .rowsBetween(Window.unboundedPreceding, 0)
    val inb = per
      .withColumn("cin_a", sum("ca").over(wIncl))
      .withColumn("cin_b", sum("cb").over(wIncl))
    val btot = per.groupBy("b").agg(sum("ca").as("ba"), sum("cb").as("bb"))
    val below = btot.select(col("b").as("_lb"))
      .join(btot.select(col("b").as("_hb"), col("ba"), col("bb")),
        col("_hb") < col("_lb"), "left")
      .groupBy(col("_lb").as("b"))
      .agg(coalesce(sum("ba"), lit(0L)).as("a_below"),
        coalesce(sum("bb"), lit(0L)).as("b_below"))
    val rows = inb.join(below, Seq("b"))
      .select(col("pq"),
        (col("a_below") + col("cin_a")).as("cum_a"),
        (col("b_below") + col("cin_b")).as("cum_b"))
    val tot = per.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val gap = rows.crossJoin(broadcast(tot))
      .select(col("pq"), col("na"), col("nb"),
        abs((col("cum_a").cast(dec) * col("nb").cast(dec)) -
          (col("cum_b").cast(dec) * col("na").cast(dec))).as("num"))
    gap.agg(max(struct(col("num"), (-col("pq")).as("ipq"), col("pq"),
        col("na"), col("nb"))).as("m"))
      .select(col("m.na").as("n_a"), col("m.nb").as("n_b"),
        TextFunctions.portableRound(
          when(col("m.na") === 0L || col("m.nb") === 0L, lit(0.0))
            .otherwise(col("m.num").cast("double") /
              (col("m.na").cast("double") * col("m.nb").cast("double"))),
          roundTo).as("ks"),
        (col("m.pq").cast("double") / lit(10000.0)).as("at_value"))
  }

  /** Exact ROC-AUC (Mann–Whitney with average-rank ties) + the best-F1
    * operating point for a score column against a boolean truth — the
    * ranking-quality eval that complements [[calibrationReport]]
    * (calibration says whether 0.8 MEANS 80%; AUC says whether the
    * ORDERING separates classes; best-F1 picks the curation cut).
    * Output (single row): n, n_pos, auc, best_threshold, best_f1,
    * best_precision, best_recall.
    *
    * Determinism + scale, the x174 recipe: scores quantize to ×10⁴
    * longs, so distinct values are ≤ 10⁴ + 1 and the prefix sums are
    * TWO-LEVEL bounded (a window inside each 0.1-wide bucket + a
    * bucket-totals join — no single-partition window over the value
    * table); rank sums accumulate exact integers into DECIMAL(38,0)
    * (U₂ ~ n², which outgrows Int64 near 3e9 rows — the Pca lesson),
    * and the only floats are the final divisions. The best-F1 winner
    * is a commutative max over an (f1, −pq)-ordered struct. */
  def rocAuc(df: DataFrame, probCol: String, labelCol: String,
             roundTo: Int = 4): DataFrame = {
    val dec = DecimalType(38, 0)
    val sc = df.select(
      floor(col(probCol) * lit(10000.0) + lit(0.5)).cast("long").as("pq"),
      col(labelCol).cast("int").cast("long").as("y"))
    val per = sc.groupBy("pq")
      .agg(count(lit(1)).as("ns"), sum(col("y")).as("ps"))
      .withColumn("b", (col("pq") / lit(1000L)).cast("int"))
    val wExcl = Window.partitionBy("b").orderBy("pq")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inb = per
      .withColumn("cin_n", coalesce(sum("ns").over(wExcl), lit(0L)))
      .withColumn("cin_p", coalesce(sum("ps").over(wExcl), lit(0L)))
    val btot = per.groupBy("b").agg(sum("ns").as("bn"), sum("ps").as("bp"))
    val below = btot.select(col("b").as("_lb"))
      .join(btot.select(col("b").as("_hb"), col("bn"), col("bp")),
        col("_hb") < col("_lb"), "left")
      .groupBy(col("_lb").as("b"))
      .agg(coalesce(sum("bn"), lit(0L)).as("nb_below"),
        coalesce(sum("bp"), lit(0L)).as("pb_below"))
    val rows = inb.join(below, Seq("b"))
      .select(col("pq"), col("ns"), col("ps"),
        (col("nb_below") + col("cin_n")).as("cb"),
        (col("pb_below") + col("cin_p")).as("cpb"))
    val tot = per.agg(sum("ns").as("t"), sum("ps").as("p"))
    val u2 = rows.agg(
      sum((col("ps") * (lit(2L) * col("cb") + col("ns") + lit(1L)))
        .cast(dec)).as("u2"))
    val fRows = rows.crossJoin(broadcast(tot))
      .select(col("pq"),
        (col("p") - col("cpb")).as("tp"),
        (col("t") - col("cb")).as("n_ge"), col("t"), col("p"))
      .select(col("pq"), col("tp"),
        ((lit(2L) * col("tp")).cast("double") /
          (col("n_ge") + col("p")).cast("double")).as("f1"),
        (col("tp").cast("double") / col("n_ge").cast("double"))
          .as("prec"),
        when(col("p") === 0L, lit(0.0))
          .otherwise(col("tp").cast("double") / col("p").cast("double"))
          .as("rec"))
    val best = fRows.agg(max(struct(col("f1"), (-col("pq")).as("ipq"),
      col("pq"), col("prec"), col("rec"))).as("m"))
    val pd = col("p").cast("double")
    val nd = (col("t") - col("p")).cast("double")
    tot.crossJoin(broadcast(u2)).crossJoin(broadcast(best))
      .select(col("t").as("n"), col("p").as("n_pos"),
        TextFunctions.portableRound(
          when(col("p") === 0L || col("p") === col("t"), lit(0.0))
            .otherwise((col("u2").cast("double") - pd * (pd + lit(1.0)))
              / (lit(2.0) * pd * nd)), roundTo).as("auc"),
        (col("m.pq").cast("double") / lit(10000.0)).as("best_threshold"),
        TextFunctions.portableRound(col("m.f1"), roundTo).as("best_f1"),
        TextFunctions.portableRound(col("m.prec"), roundTo)
          .as("best_precision"),
        TextFunctions.portableRound(col("m.rec"), roundTo)
          .as("best_recall"))
  }

  /** Population stability index between two corpus snapshots over a
    * binned score column — THE standing drift monitor for a filter
    * model's input distribution (JSD's industry sibling; x82 covers
    * token-distribution JSD, this covers score-bin PSI between
    * snapshots). Laplace-smoothed shares `(c+1)/(n+bins)` keep empty
    * bins finite, and ALL `bins` bins participate (an empty bin still
    * contributes its smoothed mass — dropping it would understate
    * drift). Output: one row per bin (bin, n_a, n_b, p_a, p_b,
    * psi_bin) with psi_total replicated per row.
    *
    * `sideCol` must be a 0/1 integer column (0 = snapshot A). */
  def psiDrift(df: DataFrame, sideCol: String, probCol: String,
               bins: Int = 10, roundTo: Int = 4): DataFrame = {
    require(bins >= 2, "psi needs at least 2 bins")
    val spark = df.sparkSession
    val bin = least(floor(col(probCol) * lit(bins)).cast("int"),
      lit(bins - 1))
    val counts = df.select(bin.as("bin"), col(sideCol).cast("long").as("s"))
      .groupBy("bin")
      .agg(sum(lit(1L) - col("s")).as("c_a"), sum(col("s")).as("c_b"))
    // every bin participates — smoothing gives empty bins mass too
    import spark.implicits._
    val allBins = broadcast((0 until bins).toDF("bin"))
    val full = allBins.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("c_a"), lit(0L)).as("n_a"),
        coalesce(col("c_b"), lit(0L)).as("n_b"))
    val tots = full.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    val pa = (col("n_a") + lit(1L)).cast("double") /
      (col("t_a") + lit(bins.toLong)).cast("double")
    val pb = (col("n_b") + lit(1L)).cast("double") /
      (col("t_b") + lit(bins.toLong)).cast("double")
    val perBin = full.crossJoin(broadcast(tots))
      .select(col("bin"), col("n_a"), col("n_b"),
        pa.as("pa_raw"), pb.as("pb_raw"))
      .withColumn("psi_raw", (col("pa_raw") - col("pb_raw")) *
        log(col("pa_raw") / col("pb_raw")))
    val total = perBin
      .agg(array_sort(collect_list(struct(col("bin"),
        col("psi_raw").as("w")))).as("arr"))
      .select(TextFunctions.portableRound(
        aggregate(col("arr"), lit(0.0), (acc, s) => acc + s.getField("w")),
        roundTo).as("psi_total"))
    perBin.select(col("bin"), col("n_a"), col("n_b"),
        TextFunctions.portableRound(col("pa_raw"), roundTo).as("p_a"),
        TextFunctions.portableRound(col("pb_raw"), roundTo).as("p_b"),
        TextFunctions.portableRound(col("psi_raw") + lit(1000.0), roundTo)
          .minus(lit(1000.0)).as("psi_bin"))
      .crossJoin(broadcast(total))
      .orderBy("bin")
  }

  /** Spearman rank correlation between two per-row scores — the
    * confound detector ("is the quality classifier just measuring
    * document length"): Pearson on AVERAGE RANKS, which handles ties
    * exactly where the classic 1 − 6Σd²/… shortcut silently doesn't.
    * Both scores must be integer-quantized (the 1e-4 classifier grid,
    * a token count, …).
    *
    * Exactness: a value bucket with `cb` rows before it and `cn` rows
    * in it has average rank cb + (cn+1)/2, so DOUBLED ranks
    * r₂ = 2·cb + cn + 1 are exact integers; the ×2 cancels in the
    * correlation. Ranks come from per-column histograms (cumulative
    * window over the bucket table, value-cardinality-bounded — the
    * x183 route) joined back to rows; the five moment sums accumulate
    * in DECIMAL (Σr₂² ~ 4n³); one fixed-order scalar expression ends
    * it. Output (one row): n, rho. */
  def spearman(df: DataFrame, aCol: String, bCol: String,
               roundTo: Int = 4): DataFrame = {
    val dec = DecimalType(38, 0)
    // the two-long row frame feeds THREE consumers (both histograms +
    // the rank join); materialize it once so an expensive upstream
    // expression (a classifier scan, a tokenizer) isn't re-run per
    // consumer — 16 bytes/row of executor-local storage buys back two
    // full input scans (measured 12.1 s → ~1 s at sf1 over the
    // classifier-scored corpus)
    val rows = df.select(col(aCol).cast("long").as("va"),
      col(bCol).cast("long").as("vb")).localCheckpoint()
    def ranks(vc: String, out: String) = {
      rows.groupBy(col(vc).as("v")).agg(count(lit(1)).as("cn"))
        .withColumn("cb", coalesce(sum(col("cn")).over(
          Ranked.bounded(col("v"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("v").as(vc),
          (lit(2L) * col("cb") + col("cn") + 1L).as(out))
    }
    val ranked = rows
      .join(ranks("va", "ra"), Seq("va"))
      .join(ranks("vb", "rb"), Seq("vb"))
    val agg = ranked.agg(count(lit(1)).as("n"),
      sum(col("ra").cast(dec)).as("sa"),
      sum(col("rb").cast(dec)).as("sb"),
      sum(col("ra").cast(dec) * col("ra").cast(dec)).as("saa"),
      sum(col("rb").cast(dec) * col("rb").cast(dec)).as("sbb"),
      sum(col("ra").cast(dec) * col("rb").cast(dec)).as("sab"))
    val num = (col("n").cast(dec) * col("sab") -
      col("sa") * col("sb")).cast("double")
    val f1 = (col("n").cast(dec) * col("saa") -
      col("sa") * col("sa")).cast("double")
    val f2 = (col("n").cast(dec) * col("sbb") -
      col("sb") * col("sb")).cast("double")
    agg.select(col("n"),
      when(f1 === 0.0 || f2 === 0.0, lit(0.0))
        .otherwise(TextFunctions.portableRound(
          num / (sqrt(f1) * sqrt(f2)) + lit(1000.0), roundTo)
          .minus(lit(1000.0))).as("rho"))
  }

  /** Murphy decomposition of the Brier score over quantized forecast
    * bins — the calibration triptych next to [[calibrationReport]]'s
    * ECE and [[rocAuc]]: reliability (how far bin forecasts sit from
    * bin outcomes — lower is better), resolution (how far bin outcomes
    * spread from the base rate — higher is better), uncertainty (the
    * base rate's own variance, the no-skill floor). The raw Brier
    * score is reported alongside; the identity brier = rel − res + unc
    * holds for the BINNED forecast (within-bin forecast variance is
    * the standard gap, reported as `within_bin`).
    *
    * Exactness: with 1e-4-quantized probabilities and 0/1 labels,
    * every per-row Brier term (pq − 10⁴y)² is an exact integer
    * (DECIMAL sums); per-bin rel/res terms are integer² / integer,
    * quantized ×10⁸ before the ≤bins-sized sums. Output (one row):
    * n, base_rate, brier, reliability, resolution, uncertainty,
    * within_bin. */
  def brierDecomposition(df: DataFrame, probCol: String,
                         labelCol: String, bins: Int = 10,
                         roundTo: Int = 4): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val dec = DecimalType(38, 0)
    val sc = df.select(
        floor(col(probCol) * lit(10000.0) + lit(0.5)).cast("long").as("pq"),
        col(labelCol).cast("boolean").cast("int").cast("long").as("y"))
      .withColumn("b", least(expr(s"(pq * $bins) DIV 10000"),
        lit(bins - 1L)))
    val per = sc.groupBy("b").agg(count(lit(1)).as("nk"),
      sum(col("pq")).as("sp"), sum(col("y")).as("sy"),
      sum(((col("pq") - lit(10000L) * col("y")) *
        (col("pq") - lit(10000L) * col("y"))).cast(dec)).as("sq"),
      sum((col("pq") * col("pq")).cast(dec)).as("spp"))
    // per-bin terms in probability² units, ×10⁸-quantized longs
    val relT = floor((col("sp") - lit(10000L) * col("sy"))
      .cast("double") * (col("sp") - lit(10000L) * col("sy"))
      .cast("double") / col("nk").cast("double") + lit(0.5)).cast("long")
    // within-bin forecast variance: Σp² − (Σp)²/n_k, exact rationals
    val wbvT = floor((col("spp").cast("double") -
      col("sp").cast("double") * col("sp").cast("double") /
        col("nk").cast("double")) + lit(0.5)).cast("long")
    val tot = per
      .withColumn("rel_t", relT).withColumn("wbv_t", wbvT)
      .agg(sum(col("nk")).as("n"), sum(col("sy")).as("yy"),
        sum(col("sq")).as("sq"), sum(col("rel_t")).as("rel_q"),
        sum(col("wbv_t")).as("wbv_q"),
        // resolution needs n and Y, so fold its exact pieces:
        // Σ_k (sy·n − Y·nk)²/(nk·n²) — accumulate the scaled parts
        collect_list(struct(col("b"), col("nk"), col("sy"))).as("_bins"))
    val n = col("n"); val yy = col("yy")
    // resolution from the ≤bins-sized collected list, folded in bin
    // order (deterministic), each term one IEEE tree quantized ×10⁸
    val resQ = aggregate(
      array_sort(col("_bins")),
      lit(0L),
      (acc, s) => acc + floor(
        (s.getField("sy").cast("double") * n.cast("double") -
          yy.cast("double") * s.getField("nk").cast("double")) *
        (s.getField("sy").cast("double") * n.cast("double") -
          yy.cast("double") * s.getField("nk").cast("double")) /
        (s.getField("nk").cast("double") * n.cast("double") *
          n.cast("double")) * lit(1.0e8) + lit(0.5)).cast("long"))
    val nd = n.cast("double") * lit(1.0e8)
    tot.select(n.as("n"),
      TextFunctions.portableRound(
        yy.cast("double") / n.cast("double"), roundTo).as("base_rate"),
      TextFunctions.portableRound(col("sq").cast("double") / nd, roundTo)
        .as("brier"),
      TextFunctions.portableRound(col("rel_q").cast("double") / nd,
        roundTo).as("reliability"),
      TextFunctions.portableRound(resQ.cast("double") / nd, roundTo)
        .as("resolution"),
      TextFunctions.portableRound(
        yy.cast("double") / n.cast("double") *
          (lit(1.0) - yy.cast("double") / n.cast("double")), roundTo)
        .as("uncertainty"),
      TextFunctions.portableRound(col("wbv_q").cast("double") / nd,
        roundTo).as("within_bin"))
  }

  /** Split-conformal calibration for a binary classifier (Vovk et al.;
    * the Angelopoulos–Bates recipe): on a held-out calibration split,
    * the nonconformity of a row is 1−s for true positives and s for
    * true negatives; the threshold q̂ is the ⌈(n+1)(1−α)⌉-th smallest
    * calibration nonconformity, and the prediction set on a test row
    * includes each label whose nonconformity is ≤ q̂. The marginal
    * coverage guarantee P(y ∈ set) ≥ 1−α holds regardless of how bad
    * the classifier is — what moves is the SET SIZE, which is the
    * report's real product: avg_set_size near 1 means the scores are
    * informative, near 2 means "calibrated but knows nothing".
    *
    * α is taken as the exact rational alphaNum/alphaDen so the rank
    * k = ⌈(n+1)(alphaDen−alphaNum)/alphaDen⌉ is integer arithmetic.
    * The order statistic is computed on ×10⁴-quantized nonconformities
    * (scores are 1e-4 multiples by the classifier contract) via the
    * x183 cumulative-histogram route — distinct-score-bounded, no
    * global sort, no driver top-k, so k growing with n costs nothing.
    * If k exceeds n (calibration set too small for the target
    * coverage), q̂ is the +∞ sentinel and every set is {0,1}.
    *
    * Output (one row): n_cal, k, qhat, n_test, coverage, avg_set_size. */
  def conformalThreshold(df: DataFrame, probCol: String,
                         labelCol: String, calCol: Column,
                         alphaNum: Int = 1, alphaDen: Int = 10,
                         roundTo: Int = 4): DataFrame = {
    require(alphaDen >= 1 && alphaNum >= 1 && alphaNum < alphaDen,
      "alpha must be a rational in (0,1)")
    val sc = df.select(col(probCol).as("s"),
        col(labelCol).cast("boolean").as("y"), calCol.as("is_cal"))
      .withColumn("ncq",
        when(col("y"), floor((lit(1.0) - col("s")) * lit(10000.0) + lit(0.5)))
          .otherwise(floor(col("s") * lit(10000.0) + lit(0.5)))
          .cast("long"))
    val per = sc.filter(col("is_cal"))
      .groupBy("ncq").agg(count(lit(1)).as("cn"))
    val kNum = alphaDen - alphaNum
    val tot = per.agg(sum(col("cn")).as("n_cal"))
      .withColumn("k",
        expr(s"((n_cal + 1) * $kNum + ${alphaDen - 1}) DIV $alphaDen"))
    val cum = per
      .withColumn("cum", sum(col("cn")).over(Ranked.bounded(col("ncq"))))
      .crossJoin(broadcast(tot))
    val qh = cum.filter(col("cum") >= col("k"))
      .agg(min(col("ncq")).as("qhatq"))
      .select(coalesce(col("qhatq"), lit(10001L)).as("qhatq"))
    val keepIn = (floor((lit(1.0) - col("s")) * lit(10000.0) + lit(0.5))
      .cast("long") <= col("qhatq")).cast("long")
    val rejIn = (floor(col("s") * lit(10000.0) + lit(0.5))
      .cast("long") <= col("qhatq")).cast("long")
    val tst = sc.filter(!col("is_cal")).crossJoin(broadcast(qh))
      .agg(count(lit(1)).as("n_test"),
        coalesce(sum(when(col("y"), keepIn).otherwise(rejIn)), lit(0L))
          .as("n_cov"),
        coalesce(sum(keepIn + rejIn), lit(0L)).as("set_sum"))
    tot.crossJoin(broadcast(qh)).crossJoin(broadcast(tst))
      .select(col("n_cal"), col("k"),
        (col("qhatq").cast("double") / lit(10000.0)).as("qhat"),
        col("n_test"),
        when(col("n_test") === 0L, lit(0.0))
          .otherwise(TextFunctions.portableRound(
            col("n_cov").cast("double") / col("n_test").cast("double"),
            roundTo)).as("coverage"),
        when(col("n_test") === 0L, lit(0.0))
          .otherwise(TextFunctions.portableRound(
            col("set_sum").cast("double") / col("n_test").cast("double"),
            roundTo)).as("avg_set_size"))
  }

  /** Kruskal–Wallis H across k groups of a long-valued column — the
    * multi-group rank test ("do the language length distributions
    * differ at all?") where [[rocAuc]]'s Mann–Whitney core answers
    * only the two-sample question. Average-rank ties; reports both
    * raw H and the tie-corrected H / (1 − ΣT/(n³−n)).
    *
    * Determinism + scale, the ksDrift recipe: per-(group, value)
    * counts first (the only corpus-sized shuffle), then per-value
    * totals with the two-level prefix-sum discipline (in-bucket window
    * + bucket-totals join — no single-partition window over the value
    * domain). Rank sums stay EXACT integers via doubled average ranks:
    * 2·R_g = Σ t_g·(2·C_less + t + 1); the only doubles are the final
    * k-term combination (error ≤ ~12n·2⁻⁵², orders below the 1e-4
    * grid for any feasible n). Output (single row): n, k_groups, h,
    * h_tc — NULL h when every value ties (n³ = n) or n ≤ k. */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String,
                    roundTo: Int = 4): DataFrame = {
    val dec = DecimalType(38, 0)
    val gv = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("tg"))
    val per = gv.groupBy("v").agg(sum("tg").as("t"))
      .withColumn("b", expr("v div 1000"))
    val wIncl = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val inb = per.withColumn("cin", sum("t").over(wIncl))
    val btot = per.groupBy("b").agg(sum("t").as("bt"))
    val below = btot.select(col("b").as("_lb"))
      .join(btot.select(col("b").as("_hb"), col("bt")),
        col("_hb") < col("_lb"), "left")
      .groupBy(col("_lb").as("b"))
      .agg(coalesce(sum("bt"), lit(0L)).as("t_below"))
    val ranks = inb.join(below, Seq("b"))
      .select(col("v"), col("t"),
        (col("t_below") + col("cin") - col("t")).as("cless"))
    val perGroup = gv.join(ranks, Seq("v"))
      .groupBy("g")
      .agg(sum(col("tg")).as("ng"),
        sum(col("tg").cast(dec) *
          (lit(2L) * col("cless") + col("t") + lit(1L)).cast(dec))
          .as("r2g"))
    // Σ (R_g²/n_g) with R_g = r2g/2 — the squared terms leave Int64,
    // so the division runs in double; see the error bound above
    val sTerm = sum(col("r2g").cast("double") * col("r2g").cast("double") /
      (lit(4.0) * col("ng").cast("double")))
    val gAgg = perGroup.agg(sTerm.as("s"),
      count(lit(1)).as("k_groups"), sum("ng").as("n"))
    val tieAgg = ranks.agg(
      sum(col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec) -
        col("t").cast(dec)).as("tie"))
    val nD = col("n").cast("double")
    val h = lit(12.0) * col("s") / (nD * (nD + lit(1.0))) -
      lit(3.0) * (nD + lit(1.0))
    val denom = lit(1.0) -
      col("tie").cast("double") / (nD * nD * nD - nD)
    gAgg.crossJoin(broadcast(tieAgg))
      .select(col("n"), col("k_groups"),
        when(col("n") <= col("k_groups"), lit(null).cast("double"))
          .otherwise(TextFunctions.portableRound(h, roundTo)).as("h"),
        when(col("n") <= col("k_groups") || denom <= lit(0.0),
            lit(null).cast("double"))
          .otherwise(TextFunctions.portableRound(h / denom, roundTo))
          .as("h_tc"))
  }
}
