package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style heuristic corpus filters — the rule family large
  * training pipelines run BEFORE any model-based scoring (Rae et al.
  * 2021 §A1.1, Raffel et al. 2020 §2.2), re-expressed as deterministic
  * scan-time predicates:
  *
  *   - document length in tokens within [minTok, maxTok]
  *   - mean token length within [minMeanLen, maxMeanLen] (drops
  *     symbol-soup and DNA-string-like docs)
  *   - max single-token frequency ratio ≤ maxRepetition (drops
  *     boilerplate/repetition loops)
  *   - fraction of tokens containing an ASCII letter ≥ minAlpha
  *     (drops tables of numbers/punctuation)
  *
  * All four statistics come from ONE codegen'd pass over the text
  * ([[graft.plans.TokenStatsExpr]]) — no explode, no shuffle — so the
  * gate filters at scan speed over 100 TB, composing with
  * [[TextFunctions.qualityScore]] (weighted score) as the reference
  * pipeline's two-stage filter. Ratios are portable-rounded to 4 before
  * thresholding, so engine-side comparisons agree bit-for-bit with the
  * DuckDB oracle.
  */
object QualityRules {

  /** Struct column (n_tok, mean_tok_len, max_freq_ratio, alpha_ratio). */
  def tokenStats(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.TokenStatsExpr(
        org.apache.spark.sql.graft.bridge.expression(text)))

  /** The Gopher-style keep decision over a [[tokenStats]] struct. */
  def gopherKeep(stats: Column,
                 minTok: Long = 50, maxTok: Long = 100000,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 maxRepetition: Double = 0.2,
                 minAlpha: Double = 0.8): Column =
    stats.getField("n_tok").between(minTok, maxTok) &&
      stats.getField("mean_tok_len").between(minMeanLen, maxMeanLen) &&
      (stats.getField("max_freq_ratio") <= maxRepetition) &&
      (stats.getField("alpha_ratio") >= minAlpha)

  /** WITHIN-document repetition statistics over LINES — the other half
    * of Gopher's repetition family (Rae et al. 2021 §A1.1 measures
    * duplicate line fraction and duplicate line CHARACTER fraction;
    * thresholds 0.30 / 0.20): scraped pages repeat nav bars, cookie
    * banners and boilerplate paragraphs that token-level stats miss.
    *
    * Returns (doc_id, n_lines, dup_line_frac, dup_char_frac, keep).
    * A line is a duplicate if an identical line occurred earlier in
    * the SAME document; fractions are occurrence-weighted (a line
    * appearing c times contributes c−1 duplicates), portable-rounded
    * to 4 so thresholding agrees bit-for-bit with the DuckDB oracle.
    * BLANK lines (empty after space-trim) are excluded before
    * counting: they are paragraph SEPARATORS, and counting them as
    * repeats would reject any ordinary prose with ≥5 blank-separated
    * paragraphs (4 duplicate empties / 9 lines = 0.33 > 0.3). A doc
    * with no non-blank lines reports n_lines 0 and zero fractions.
    *
    * Shape that scales: explode to (doc, line) rows, then IMMEDIATELY
    * reduce each line to (xxhash64, length) so the shuffle carries
    * ~20 bytes per row instead of the line text (boilerplate lines run
    * to hundreds of chars — a raw-line key would shuffle roughly the
    * whole corpus). Two codegen'd hash aggregations follow (per-line
    * counts with map-side partial agg, then per-doc ratios); every
    * arithmetic step stays integer until the final division. Line
    * identity via (64-bit hash, length) is the same hash-equality
    * convention [[graft.operators.Dedup.exact]] uses for whole texts;
    * the oracle groups raw lines, identical up to hash collisions. */
  def lineRepetitionStats(df: DataFrame, idCol: String, textCol: String,
                          maxDupLineFrac: Double = 0.3,
                          maxDupCharFrac: Double = 0.2): DataFrame = {
    val totChars = sum(col("c") * col("len"))
    val perLine = df.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\n", -1)).as("line"))
      .filter(length(trim(col("line"))) > 0)
      .select(col("doc_id"), xxhash64(col("line")).as("h"),
        length(col("line")).as("len"))
      .groupBy("doc_id", "h", "len").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_lines"),
        TextFunctions.portableRound(
          sum(col("c") - 1).cast("double") / sum(col("c")), 4)
          .as("dup_line_frac"),
        when(totChars === 0, lit(0.0))
          .otherwise(TextFunctions.portableRound(
            sum((col("c") - 1) * col("len")).cast("double") / totChars, 4))
          .as("dup_char_frac"))
    // all-blank docs dropped by the filter re-enter with zero stats
    // (same left-join shape as the x32 oracle)
    df.select(col(idCol).as("doc_id"))
      .join(perLine, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac"),
        coalesce(col("dup_char_frac"), lit(0.0)).as("dup_char_frac"))
      .withColumn("keep",
        col("dup_line_frac") <= maxDupLineFrac &&
          col("dup_char_frac") <= maxDupCharFrac)
  }
}
