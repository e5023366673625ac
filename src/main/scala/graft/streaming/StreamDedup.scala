package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** In-flight exactly-once event dedup for streams — the front door of
  * a streaming training-data pipeline (at-least-once sources redeliver;
  * downstream state must see each event once).
  *
  * `dropDuplicatesWithinWatermark` keys the dedup state on `keyCols`
  * and evicts each key once the watermark passes its event time, so
  * state is O(events inside the watermark window), not O(history) —
  * the difference between a stream that runs for years and one that
  * OOMs in a week. Duplicates arriving within the watermark window are
  * dropped even when their timestamps differ slightly (retries often
  * re-stamp), which plain `dropDuplicates` on (key, ts) would miss.
  *
  * Contrast the other two dedup tiers here:
  *   - StreamIngest's idempotent MERGE: dedup at the SINK (state = the
  *     table itself, unbounded keys, exactly-once per file);
  *   - this: dedup in FLIGHT (bounded state, exactly-once per event
  *     within the lateness bound);
  *   - Dedup.exact/minhash...: dedup at REST (batch, content-based).
  */
object StreamDedup {

  /** Drop redelivered events by `keyCols`, with state bounded by the
    * watermark on `tsCol` (must carry `allowedLateness` at least as
    * large as the source's redelivery horizon). On a batch frame the
    * same call degrades to plain `dropDuplicates` EXPLICITLY — Spark
    * rejects `dropDuplicatesWithinWatermark` for batch outright
    * (UnsupportedOperationChecker), and batch has all the data, so
    * whole-history dedup IS the within-watermark semantics there
    * (backfills reuse this one entry point). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           allowedLateness: String,
                           keyCols: Seq[String]): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark(tsCol, allowedLateness)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)
}
