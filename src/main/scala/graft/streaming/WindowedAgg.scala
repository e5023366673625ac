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

  /** Per-event trailing moving average: for every event, the mean of
    * `valueCol` over the key's events in the last `windowMs`
    * milliseconds INCLUDING the event — a RANGE-frame window (the frame
    * is bounded by event-time distance, not row count; same-timestamp
    * peers are always all included, so the frame's VALUE SET is
    * order-independent). The mean itself is
    * [[graft.plans.SortedSumD]] / count — a value-sorted sequential
    * fold, so the float result is bit-deterministic under any row
    * order too (a plain `avg` accumulates in physical peer order,
    * which is nondeterministic for same-ms peers and could flip a
    * value at a rounding boundary). Batch form of the sliding signal
    * a dashboard overlays on [[tumbling]]'s buckets.
    *
    * Scale shape: one shuffle on the key, one sort within partitions;
    * sliding RANGE frames re-aggregate per distinct frame either way
    * (Spark has no retract path), so the sorted fold adds only the
    * in-frame sort. */
  def movingAvg(events: DataFrame, tsCol: String, keyCol: String,
                valueCol: String, windowMs: Long,
                roundTo: Int = 4, idCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("ms").rangeBetween(-windowMs, 0)
    events
      .select(col(idCol), col(keyCol),
        unix_millis(col(tsCol)).as("ms"),
        col(valueCol).cast("double").as("_v"))
      .select(col(idCol), col(keyCol), col("ms"),
        count(lit(1)).over(w).cast("long").as("n_win"),
        graft.functions.TextFunctions.portableRound(
          graft.plans.SortedSumD(col("_v")).over(w) /
            count(lit(1)).over(w).cast("double"), roundTo).as("avg_win"))
  }

  /** Time-weighted average per key (TWAP): each value weighted by how
    * long it was "current" — the duration until the key's next event.
    * The metric that makes irregular event streams comparable (a plain
    * mean over-weights chatty periods); the last observation per key
    * has no duration and contributes nothing.
    *
    * Determinism: values are fixed-point quantized (×2^`qBits`) to
    * longs and durations are exact millisecond integers, so both the
    * weighted sum and the duration sum are exact integer arithmetic —
    * one final division. The lead window orders by (ms, id), so
    * same-timestamp peers get deterministic durations on any engine.
    *
    * Scale shape: one shuffle on the key, one in-partition sort, one
    * lead — the same bound as any keyed window. Long-sum bound:
    * Σ per key of (maxval·2^qBits)·span_ms must fit 2⁶³ — at default
    * qBits=10 that allows maxval·span ≈ 9×10¹⁵, i.e. decades of ms
    * span at 10⁵-scale values; lower qBits for wilder ranges. */
  def timeWeightedAvg(events: DataFrame, tsCol: String, keyCol: String,
                      valueCol: String, idCol: String = "event_id",
                      qBits: Int = 10, roundTo: Int = 6): DataFrame = {
    val q = (1L << qBits).toDouble
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("ms"), col(idCol))
    val vq = floor(col(valueCol).cast("double") * lit(q) + lit(0.5))
      .cast("long")
    events
      .select(col(idCol), col(keyCol),
        unix_millis(col(tsCol)).as("ms"), vq.as("vq"))
      .select(col(keyCol), col("vq"),
        (lead(col("ms"), 1).over(w) - col("ms")).as("dur"))
      .filter(col("dur").isNotNull)
      .groupBy(keyCol)
      .agg(count(lit(1)).cast("long").as("n_intervals"),
        sum(col("dur")).cast("long").as("span_ms"),
        sum(col("vq") * col("dur")).cast("long").as("wsum"))
      .select(col(keyCol), col("n_intervals"), col("span_ms"),
        graft.functions.TextFunctions.portableRound(
          col("wsum").cast("double") /
            (col("span_ms").cast("double") * lit(q)), roundTo)
          .as("twap"))
  }
}
