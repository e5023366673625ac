package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
