package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.operators.MergeUpsert

/** S3 — event-triggered ingestion as Structured Streaming (SURVEY.md §2.9).
  *
  * The reference's "streaming" is S3 Put → Lambda → whole-file ETL
  * (reference: aws/lambda_handler.py:7-52, ingest_capacity_s3.py:22-45):
  * no windows, no watermarks — just at-least-once file arrival made safe
  * by the idempotent keyed upsert. The Spark-native equivalent is a file
  * source + `Trigger.AvailableNow` + `foreachBatch(merge)`:
  *   - checkpointed file tracking upgrades at-least-once to exactly-once
  *     per file;
  *   - the MERGE inside foreachBatch is the late/duplicate-data policy,
  *     byte-identical to the batch path (same MergeUpsert);
  *   - at scale the same code runs continuously (ProcessingTime trigger)
  *     over an arrival directory.
  */
object StreamIngest {

  /** Drain all currently-available files from `srcGlob` into the keyed
    * parquet table at `targetPath` (last-writer-wins on `keys`).
    * Blocking; returns when the AvailableNow drain finishes. */
  def ingestAvailableNow(spark: SparkSession, srcGlob: String,
                         schema: StructType, targetPath: String,
                         keys: Seq[String], checkpoint: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(srcGlob)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MergeUpsert.mergeWritePlain(batch.sparkSession, targetPath, batch, keys)
      }
      .start()
    q.awaitTermination()
  }
}
