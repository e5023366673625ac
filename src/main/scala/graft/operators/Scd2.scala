package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history: turn a sequence of keyed
  * snapshots into interval rows (valid_from, valid_to, is_current) —
  * the standard warehouse answer to "what did this dimension row look
  * like when that fact was recorded", and the batch complement of
  * [[MergeUpsert]]'s type-1 overwrite semantics (reference model:
  * the hospital pipeline's per-date region re-ingest, which type-1
  * overwrites today's row; SCD2 is what a warehouse keeps instead when
  * history matters).
  *
  * Input contract: at most one row per (key, batch) — the caller's
  * snapshot extraction aggregates to that grain (non-deterministic
  * duplicate rows would make run-length merging itself
  * non-deterministic). Batches need not be contiguous per key: a key
  * absent from a batch simply isn't observed (no tombstoning here —
  * pair with [[MergeUpsert.deleteWhere]] semantics for hard deletes).
  *
  * Semantics: consecutive observations with UNCHANGED attributes merge
  * into one interval; a change opens a new interval at its batch. An
  * interval's valid_to is the NEXT interval's valid_from (half-open,
  * the warehouse convention); the last interval per key has
  * valid_to = NULL and is_current = true. Attribute comparison is
  * null-safe (`<=>`): null → value and value → null both count as
  * changes, null → null does not.
  *
  * Scale shape: two window passes over the same (key, batch)
  * partitioning — Catalyst reuses one shuffle for both (lag for change
  * detection, lead for interval close), and the second window's input
  * is only the CHANGE rows (run starts), typically a small fraction of
  * the snapshot stream. No joins, no driver state.
  */
object Scd2 {

  def history(snapshots: DataFrame, keyCol: String, batchCol: String,
              attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2: at least one tracked attribute")
    val w = Window.partitionBy(keyCol).orderBy(batchCol)
    val changed = attrCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) || lag(col(batchCol), 1).over(w).isNull
    val runs = snapshots
      .withColumn("chg", changed)
      .filter(col("chg"))
      .select((keyCol +: attrCols).map(col) :+
        col(batchCol).as("valid_from"): _*)
    val w2 = Window.partitionBy(keyCol).orderBy("valid_from")
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
