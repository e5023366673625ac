package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar semantics (SURVEY.md §2.2) as pure Column
  * expressions — zero UDFs, so every call stays inside Catalyst
  * optimization and whole-stage codegen.
  *
  * Two deliberate divergences in the reference are preserved as separate
  * functions (do NOT unify them):
  *   - ETL bed occupancy yields 0.0 on zero beds (compute_metrics.py:56)
  *     while the API variant yields NULL (main.py:164).
  *   - Python truthiness treats icu_beds = 0 as missing (main.py:167,
  *     compute_metrics.py:60) → encoded as `isNotNull && > 0`.
  */
object CapacityFunctions {

  /** P5 — ETL bed-occupancy ratio: `occupied/total if total > 0 else 0.0`
    * (reference: compute_metrics.py:56). */
  def bedOccPctEtl(occupied: Column, total: Column): Column =
    when(total > 0, occupied.cast("double") / total.cast("double")).otherwise(lit(0.0))

  /** P6 — API bed-occupancy ratio: NULL (not 0.0) on zero beds, rounded
    * half-even to 4 places like Python `round` (reference: main.py:164). */
  def bedOccPctApi(occupied: Column, total: Column): Column =
    when(total > 0, bround(occupied.cast("double") / total.cast("double"), 4))

  /** P7 — ICU ratio with Python-truthiness guard: icu_beds must be
    * non-null AND > 0 (zero counts as missing), icu_occupied non-null
    * (reference: main.py:165-169, compute_metrics.py:59-61). */
  def icuOccPct(icuOccupied: Column, icuBeds: Column): Column =
    when(icuBeds.isNotNull && icuBeds > 0 && icuOccupied.isNotNull,
      icuOccupied.cast("double") / icuBeds.cast("double"))

  /** P7 API variant — rounded to 4 (reference: main.py:165-169). */
  def icuOccPctApi(icuOccupied: Column, icuBeds: Column): Column =
    bround(icuOccPct(icuOccupied, icuBeds), 4)

  /** P8 — strain index (reference: compute_metrics.py:11-21, README.md:35-44):
    * bed_score = bed_occ_pct*100; icu_score = icu_occ_pct*100 when present,
    * else bed_score; round(min(100, max(0, 0.4*bed + 0.6*icu)), 2).
    * `bround` = HALF_EVEN matches Python's banker's rounding. */
  def strainIndex(bedOccPct: Column, icuOccPct: Column): Column = {
    val bedScore = bedOccPct * lit(100.0)
    val icuScore = coalesce(icuOccPct * lit(100.0), bedScore)
    bround(
      least(lit(100.0), greatest(lit(0.0), bedScore * lit(0.4) + icuScore * lit(0.6))),
      2)
  }

  /** P11 — strain banding: >80 CRISIS, ≥70 ELEVATED, else STABLE
    * (reference: dashboard.html:328-338, README.md:59). */
  def strainBand(strain: Column): Column =
    when(strain > 80, lit("CRISIS"))
      .when(strain >= 70, lit("ELEVATED"))
      .otherwise(lit("STABLE"))

  /** P12 — display-layer delta coalesce (`delta || 0`, dashboard.html:280);
    * the API layer keeps NULL (main.py:274-277) — callers choose. */
  def deltaDisplay(delta: Column): Column = coalesce(delta, lit(0.0))

  /** P12 — signed fixed-point formatting, e.g. "+1.5" / "-0.3"
    * (reference: dashboard.html:340-348, App.tsx:70-74). */
  def signedFixed(c: Column, decimals: Int): Column =
    format_string(s"%+.${decimals}f", c)

  /** P13 — integer percent formatting "NN%" (dashboard.html:324-326). */
  def pctRounded(c: Column): Column =
    concat(round(c).cast("int").cast("string"), lit("%"))

  /** Generic clamped weighted score — the strain-index shape over any two
    * ratio columns (used by the oracle queries over TPC-H-ish data). Uses
    * HALF_UP `round` for engine-portable rounding on positive scores. */
  def clampedWeightedScore(primary: Column, secondary: Column,
                           wPrimary: Double, wSecondary: Double): Column =
    round(
      least(lit(100.0), greatest(lit(0.0),
        primary * lit(wPrimary) + coalesce(secondary, primary) * lit(wSecondary))),
      2)
}
