package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J3 — strict day-over-day self left-outer join ("as-of, exactly -1 day").
  *
  * The reference's /metrics/compare joins current-day metrics to metrics at
  * exactly `date - 1 day` per region (reference: main.py:249-271) with a
  * NULL-propagating `delta = strain - prev_strain` (main.py:274-277).
  * A naive `lag()` over sparse dates is WRONG — lag gives the previous
  * AVAILABLE date, the reference demands the previous CALENDAR date
  * (SURVEY.md §7.4.6) — so the join form is the semantic ground truth.
  *
  * Scale: the join shuffles both sides on (partitionCols, date), which is
  * exactly the table's natural clustering; with the fact table
  * date-partitioned and the query filtered to one target date (as the
  * endpoint does), both sides prune to two partitions before the join.
  */
object AsOfDelta {

  /** For each row, attach `prev_<valueCol>` from the row with the same
    * `partitionCols` and date exactly `offsetDays` earlier, plus
    * `delta_<valueCol>` (NULL when no previous row). */
  def strictLag(df: DataFrame, partitionCols: Seq[String], dateCol: String,
                valueCols: Seq[String], offsetDays: Int = 1): DataFrame = {
    val cur = df.as("cur")
    val prev = df
      .select((partitionCols :+ dateCol).map(col) ++
        valueCols.map(c => col(c).as(s"prev_$c")): _*)
      .as("prev")
    val joinCond = partitionCols
      .map(c => col(s"cur.$c") === col(s"prev.$c"))
      .reduce(_ && _) &&
      (col(s"prev.$dateCol") === date_sub(col(s"cur.$dateCol"), offsetDays))
    val joined = cur.join(prev, joinCond, "left_outer")
    val outCols =
      df.columns.map(c => col(s"cur.$c").as(c)) ++
        valueCols.map(c => col(s"prev_$c")) ++
        valueCols.map(c => (col(s"cur.$c") - col(s"prev_$c")).as(s"delta_$c"))
    joined.select(outCols: _*)
  }
}
