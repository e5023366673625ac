package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P3 — ordered row-validation cascade (reference: ingest_capacity.py:23-59).
  *
  * The reference validates row-at-a-time in Python with early returns: the
  * reject reason is the FIRST failing rule's message. We preserve rule order
  * exactly with a single `when(...).when(...)` cascade — one vectorized,
  * codegen'd expression instead of a Python loop, so validation runs at
  * scan speed and never materializes rows on the driver.
  */
object Validation {

  /** One validation rule: `failsWhen` true ⇒ reject with `reason`. */
  final case class Rule(failsWhen: Column, reason: String)

  /** Ordered cascade → reject-reason column (NULL = row accepted).
    * First matching rule wins, like the reference's early returns. */
  def rejectReason(rules: Seq[Rule]): Column =
    rules.reverse.foldLeft(lit(null).cast("string")) { (tail, r) =>
      when(r.failsWhen, lit(r.reason)).otherwise(tail)
    }

  /** The reference's capacity rules, in declared order
    * (ingest_capacity.py:29-57). Columns are the canonical (renamed)
    * names; date is the raw string, dateParsed its to_date result so the
    * "parseable" requirement can distinguish absent vs malformed.
    *
    * Two DELIBERATE divergences from the reference's reject contract:
    *   - Malformed-but-present dates: the reference runs parse_date
    *     BEFORE validation (main.py) and raises ValueError, failing the
    *     whole run on one bad cell. Here the row rejects with its own
    *     'invalid date format' reason — at 100 TB one bad cell must not
    *     kill the batch, and the distinct reason keeps the failure
    *     diagnosable.
    *   - Whitespace-only regions: the reference's pd.isna('   ') is
    *     False, so '   ' passes as a region name; here trim(region)=''
    *     rejects it — a blank-string region is a data error, not a dim.
    */
  def capacityRules(date: Column, dateParsed: Column, region: Column,
                    totalBeds: Column, occupiedBeds: Column,
                    icuBeds: Column, icuOccupied: Column): Seq[Rule] = Seq(
    Rule(date.isNull, "date is required"),
    Rule(dateParsed.isNull, "invalid date format"), // date present (rule order)
    Rule(region.isNull || trim(region) === "", "region is required"),
    Rule(totalBeds.isNull, "total_beds is required"),
    Rule(occupiedBeds.isNull, "occupied_beds is required"),
    Rule(totalBeds < 0, "total_beds cannot be negative"),
    Rule(occupiedBeds < 0, "occupied_beds cannot be negative"),
    Rule(occupiedBeds > totalBeds, "occupied_beds cannot exceed total_beds"),
    Rule(icuBeds.isNotNull && icuBeds < 0, "icu_beds cannot be negative"),
    Rule(icuBeds.isNotNull && icuOccupied.isNotNull && icuOccupied < 0,
      "icu_occupied cannot be negative"),
    Rule(icuBeds.isNotNull && icuOccupied.isNotNull && icuOccupied > icuBeds,
      "icu_occupied cannot exceed icu_beds")
  )

  /** Split a DataFrame carrying a `_reject_reason` column into
    * (accepted-without-reason, rejected-with-reason). Reference keeps the
    * original row index in rejects (ingest_capacity.py:140-153); callers
    * add `_original_index` upstream if they need it. */
  def split(df: DataFrame, reasonCol: String = "_reject_reason"): (DataFrame, DataFrame) = {
    val accepted = df.filter(col(reasonCol).isNull).drop(reasonCol)
    val rejected = df.filter(col(reasonCol).isNotNull)
    (accepted, rejected)
  }
}
