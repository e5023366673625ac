package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming twin of the batch `session_window` aggregation (catalog
  * x197): the native merging-window state operator run over a
  * file-arrival stream with watermark eviction — Spark's built-in
  * replacement for the custom `flatMapGroupsWithState` sessionizer
  * ([[Sessionize]]) when the fold is a plain count/sum.
  *
  * Exactly-once: the file source's own commit log guarantees each
  * arrival file enters the aggregation once (the x11 ingest contract);
  * the append-mode agg emits a session exactly once, when the
  * watermark passes its end. State is bounded by OPEN sessions per
  * user — closed sessions are evicted on emission — and partitions
  * size to the drain rate (the x114 lesson), so `shufflePartitions`
  * governs state-store count, not corpus size.
  *
  * Flushing: append mode only emits sessions the watermark has closed,
  * so a finite replay would otherwise hold its last sessions open
  * forever. Callers append a far-future SENTINEL event (a reserved
  * user id) as the final arrival file; its watermark advance flushes
  * every real session, its own session never closes, and the reader
  * filters the sentinel id out. That is exactly how a production
  * pipeline drains a partition: a high-watermark heartbeat, not data.
  */
object StreamSessions {

  /** The reserved sentinel user id — never a real key. */
  val SentinelUser: Long = -987654321L

  /** Drain `arrivals` (parquet files of `schema`, ts = ns long)
    * through a watermarked `session_window` aggregation; append each
    * micro-batch's closed sessions to `out`; return the read-back
    * result shaped like x197 (user_id, start_ms, end_ms, n_events,
    * total_value), sentinel rows dropped.
    *
    * Values are quantized to exact ×10⁴ longs BEFORE the aggregation
    * (the x197 discipline) so the state-store sum is order-free. One
    * file per micro-batch (`maxFilesPerTrigger 1`) keeps the arrival
    * order = modification-time order, so the sentinel's watermark
    * advance lands after every data file. */
  def sessionsAvailableNow(spark: SparkSession, arrivals: String,
                           schema: StructType, out: String,
                           checkpoint: String,
                           gap: String = "12 hours"): DataFrame = {
    val sessions = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(arrivals)
      .select(col("user_id"),
        timestamp_micros(expr("ts DIV 1000")).as("ts"),
        floor(col("value") * lit(10000.0) + lit(0.5)).cast("long")
          .as("vq"))
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col("vq")).as("sq"))
    val q = sessions.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start()
    q.awaitTermination()
    // existence via Hadoop FileSystem, not java.io.File: the output may
    // carry a URI scheme (file:/, hdfs:/, s3a:/) where a local-path
    // check is silently false even when the sink wrote rows
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw =
      if (fs.exists(outPath)) spark.read.parquet(out)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(sessions.schema))
    raw.filter(col("user_id") =!= lit(SentinelUser))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("start_ms"),
        unix_millis(col("sw.end")).as("end_ms"),
        col("n_events"),
        graft.functions.TextFunctions.portableRound(
          col("sq").cast("double") / lit(10000.0), 4).as("total_value"))
      .orderBy("user_id", "start_ms")
  }
}
