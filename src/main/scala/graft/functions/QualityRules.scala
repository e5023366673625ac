package graft.functions

import org.apache.spark.sql.Column
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
}
