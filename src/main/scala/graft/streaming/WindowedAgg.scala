package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation over an event stream — the
  * standard windowed-agg shape the reference never needed (its
  * "streaming" is whole-file replay) but any event pipeline at scale
  * does: per-(window, key) incremental state, bounded by the watermark
  * (windows older than watermark are finalized, emitted once in append
  * mode, and their state evicted).
  *
  * Late events inside the allowed lateness fold into their window;
  * events later than the watermark are dropped — the explicit,
  * bounded-state late-data policy (contrast S3/StreamIngest, where the
  * idempotent MERGE is the policy and state is the table itself).
  */
object WindowedAgg {

  /** Tumbling `windowDur` counts+sums of `valueCol` per `keyCol`.
    * Works on a streaming OR batch DataFrame with an event-time `tsCol`
    * (streaming requires the watermark for append-mode emission). */
  def tumbling(events: DataFrame, tsCol: String, keyCol: String,
               valueCol: String, windowDur: String,
               allowedLateness: String): DataFrame =
    events
      .withWatermark(tsCol, allowedLateness)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n"), col("total"))
}
