package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming exact deduplication with BOUNDED state:
  * `dropDuplicatesWithinWatermark` keeps each key in the state store
  * only until the watermark passes it — the at-ingest dedup a pipeline
  * runs against redelivered/overlapping source files, where the
  * duplicates arrive within a bounded lag of the original.
  *
  * Why not plain `dropDuplicates`: its state never evicts, so a
  * 100 TB/day stream grows the store without bound. The watermark
  * variant trades that for an explicit contract — duplicates farther
  * apart than the delay MAY pass (they're either late-dropped or
  * re-admitted after eviction); size the delay to the source's real
  * redelivery horizon. Contrast [[graft.operators.IncrementalDedup]],
  * which keeps an EXACT persistent signature store for cross-batch
  * dedup at rest; this operator is the in-flight complement.
  *
  * Exactly-once: append-only → the parquet sink's commit log + the
  * source offset log suffice (the [[StreamEnrich]] argument); the
  * dedup state checkpoints with the query. */
object StreamDedupe {

  /** Drain the arrival directory once (AvailableNow) with
    * `maxFilesPerTrigger = 1` — each file is its own micro-batch, so
    * cross-FILE duplicates genuinely cross micro-batch state, not just
    * one batch-local distinct. Keys on `idCol`; event time from
    * `tsNsCol` (ns longs). Blocking. */
  def dedupeAvailableNow(spark: SparkSession, srcGlob: String,
                         schema: StructType, idCol: String,
                         tsNsCol: String, targetPath: String,
                         checkpoint: String,
                         watermarkDelay: String = "1 hour"): Unit = {
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcGlob)
      // DIV, not /: true division goes through double and loses
      // sub-ms precision at epoch-ns magnitudes
      .withColumn("_ets", timestamp_micros(expr(s"$tsNsCol DIV 1000")))
      .withWatermark("_ets", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)
      .drop("_ets")
      .writeStream
      .format("parquet")
      .option("path", targetPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Read the deduplicated table back through the sink's commit log. */
  def readDeduped(spark: SparkSession, targetPath: String): DataFrame =
    spark.read.parquet(targetPath)
}
