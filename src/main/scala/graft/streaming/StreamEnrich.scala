package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Stream–static enrichment: join an arriving event stream against a
  * broadcast dimension and land the enriched rows — the stateless
  * lookup-join every event pipeline runs in front of its aggregations
  * (and the streaming face of J1's fact×dim join).
  *
  * Exactly-once WITHOUT the versioned store: enrichment is stateless
  * and 1:1, so the parquet FILE SINK's transaction log
  * (`_spark_metadata`) is sufficient — a restarted query re-reads only
  * unprocessed source files (file-source offset log) and readers only
  * trust files the sink log committed, so a crash between write and
  * commit is invisible. Contrast [[StreamIngest]], which needs the
  * atomic version flip because MERGE is not append-only, and
  * [[StreamStats]]/[[StreamScd2]], which need a ledger because their
  * state is cumulative.
  *
  * Scale shape: the dimension broadcasts (explicitly — a stream-side
  * shuffle join would re-shuffle every micro-batch); the stream side
  * is a pure map over arriving files. A dimension too large to
  * broadcast belongs in [[StreamIngest]]-style foreachBatch with a
  * co-bucketed join instead. */
object StreamEnrich {

  /** Drain all currently-arrived files once (AvailableNow), enriching
    * via LEFT join on `streamKey` = `dimKey`. Blocking. */
  def enrichAvailableNow(spark: SparkSession, srcGlob: String,
                         schema: StructType, dim: DataFrame,
                         streamKey: String, dimKey: String,
                         targetPath: String, checkpoint: String): Unit = {
    val q = spark.readStream.schema(schema).parquet(srcGlob)
      .join(broadcast(dim), col(streamKey) === col(dimKey), "left")
      .drop(dimKey)
      .writeStream
      .format("parquet")
      .option("path", targetPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Read back an enriched table through the sink's commit log (only
    * committed files are visible — the exactly-once read side). */
  def readEnriched(spark: SparkSession, targetPath: String): DataFrame =
    spark.read.parquet(targetPath)
}
