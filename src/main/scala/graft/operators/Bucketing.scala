package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables + shuffle-free sort-merge joins —
  * the co-location story for joins whose BOTH sides are too big to
  * broadcast: pay the key shuffle ONCE at write time (`bucketBy` +
  * `sortBy`), and every subsequent join/aggregation on the bucket key
  * reads co-located, pre-sorted buckets with NO Exchange and NO Sort
  * in the plan. At 100 TB this converts the recurring dominant cost of
  * a fact-fact join (two full shuffles per query) into a one-time
  * layout decision — the classic warehouse SMB-join contract.
  *
  * Requirements Spark imposes (all asserted by BucketingSpec's plan
  * check): both sides bucketed by the JOIN KEY with the SAME bucket
  * count, read back via `spark.table` (bucket metadata lives in the
  * catalog, not the files), and the join not converted to broadcast
  * (scope `spark.sql.autoBroadcastJoinThreshold = -1` when the point
  * is the SMB path). */
object Bucketing {

  /** Write `df` as a bucketed EXTERNAL table (data under `path`, so no
    * warehouse-directory pollution; metadata in the session catalog).
    * Re-registers idempotently. */
  def writeBucketed(df: DataFrame, keyCol: String, buckets: Int,
                    name: String, path: String): Unit = {
    require(buckets >= 1, "buckets must be >= 1")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.bucketBy(buckets, keyCol).sortBy(keyCol)
      .option("path", path).format("parquet").saveAsTable(name)
  }

  /** Join two same-bucket-count tables on their bucket keys without a
    * shuffle (broadcast disabled for the scope so the SMB path is the
    * one that runs). Returns the joined frame — callers aggregate or
    * project as usual; only the JOIN is exchange-free, downstream
    * shuffles are theirs. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, leftKey: String,
                   rightKey: String)(
                   agg: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    graft.ScopedSessionConf.withConf(spark,
      "spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = spark.table(leftTable)
        .join(spark.table(rightTable), col(leftKey) === col(rightKey))
      // materialize INSIDE the scope — a lazy frame would escape it
      val out = agg(joined)
      out.localCheckpoint(eager = true)
    }
  }
}
