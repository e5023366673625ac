package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY §4 / the 100 TB
  * playbook): writing both sides of a recurring big-big equi join
  * bucketed (and sorted) by the join key makes every subsequent join
  * shuffle-free — each task zips bucket i with bucket i. The shuffle is
  * paid ONCE at write time instead of on every query.
  *
  * Use for fact-fact joins too big to broadcast (e.g. capacity ⋈ metrics
  * at full history, lineitem ⋈ orders): pick numBuckets ≈ cluster
  * parallelism at target scale and the natural key as bucket+sort key.
  * Parquet bucketed tables need the session catalog (`saveAsTable`) —
  * bucket metadata lives in the table definition, not the files.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, tableName: String, bucketCols: Seq[String],
                    numBuckets: Int,
                    sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(tableName)
  }

  def readTable(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
