package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Watermark late-data accounting — the BATCH replay of the decision
  * Structured Streaming's watermark makes on every row: a row is LATE
  * iff its event time is below (max event time seen so far − delay) at
  * the moment it ARRIVES. Streaming drops such rows silently (state for
  * their window is already evicted); this audit is the report a
  * pipeline runs BEFORE picking `withWatermark`'s delay — "how much
  * data would each candidate delay discard, and how late is the tail?"
  *
  * The per-arrival rule is a CONSERVATIVE (upper-bound) model of the
  * engine: a real stream advances the watermark only at micro-batch
  * BOUNDARIES, so rows that arrive in the same batch as the maximum
  * that would doom them are in fact admitted — the replay counts them
  * dropped. Exact equality holds when every arrival is its own
  * micro-batch (LateDataSpec's MemoryStream case pins that); at
  * coarser batching the audit over-counts, never under-counts, which
  * is the safe direction for picking a delay.
  *
  * Deterministic by construction: arrival order is a caller-supplied
  * column (a file sequence number, an ingest offset), so the replay is
  * layout-independent and oracle-checkable — unlike the live stream,
  * where arrival order is whatever the source raced to.
  *
  * Scale shape: the running "max event time seen so far" is a prefix
  * maximum over arrival order — computed with the two-level discipline
  * (in-bucket window over arrival-time buckets + a bucket-maxima join),
  * NEVER a single-partition global window; bucket count is bounded by
  * the corpus time span, not its row count. One corpus-sized shuffle
  * (the bucket window), one tiny join, one group-by. */
object LateData {

  /** Per-group late-arrival audit: (group, n, n_late, late_ratio,
    * max_late_ms). `arrivalCol` orders arrivals (ties break on it
    * being unique per row — use the ingest sequence); `tsMsCol` is the
    * event time in epoch millis; a row is late when
    * ts < max(prior ts) − delayMs. max_late_ms reports how far past
    * the watermark the latest row was (0 when none) — the number that
    * says what delay WOULD have kept everything. */
  def lateArrivalAudit(df: DataFrame, arrivalCol: String, tsMsCol: String,
                       groupCol: String, delayMs: Long,
                       bucketMs: Long = 86400000L): DataFrame =
    flagged(df, arrivalCol, tsMsCol, Seq(groupCol), delayMs, bucketMs)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("late_by") > 0L, 1L).otherwise(0L)).as("n_late"),
        graft.functions.TextFunctions.portableRound(
          sum(when(col("late_by") > 0L, 1L).otherwise(0L)).cast("double")
            / count(lit(1)).cast("double"), 4).as("late_ratio"),
        max(col("late_by")).as("max_late_ms"))
      .orderBy(groupCol)

  /** The QUARANTINE face: the rows the watermark would have dropped,
    * with how far past it each arrived — the dead-letter table a
    * pipeline lands instead of discarding (the reference's reject-sink
    * policy applied at stream grain: rejects are data, not log lines).
    * Same per-arrival rule and two-level machinery as the audit;
    * `carryCols` ride through for downstream triage. */
  def lateRows(df: DataFrame, arrivalCol: String, tsMsCol: String,
               carryCols: Seq[String], delayMs: Long,
               bucketMs: Long = 86400000L): DataFrame =
    flagged(df, arrivalCol, tsMsCol, carryCols, delayMs, bucketMs)
      .filter(col("late_by") > 0L)
      .select((col("arr") +: col("ms") +: carryCols.map(col)) :+
        col("late_by"): _*)

  /** Shared per-row frame: every input row plus its `late_by` margin
    * (0 = on time; the global first arrival has no watermark yet and
    * is never late).
    *
    * Bucket width is validated against the OBSERVED arrival span:
    * `bucketMs` is in the arrival column's own units (epoch millis for
    * the default; a file sequence number or ingest offset needs a
    * width scaled to ITS range), and a mis-scaled width — the
    * day-in-millis default over small-integer sequence numbers — would
    * land every row in one bucket, silently degenerating the two-level
    * prefix max into the single-partition global window this class
    * exists to avoid. When the caller's width yields < 32 buckets over
    * the span, the width is re-derived to ~1024 buckets (deterministic
    * in the data; bucketing is a physical strategy only — `late_by` is
    * bucket-independent, so results never move). Costs one
    * column-pruned min/max pre-pass. */
  private def flagged(df: DataFrame, arrivalCol: String, tsMsCol: String,
                      carryCols: Seq[String], delayMs: Long,
                      bucketMs: Long): DataFrame = {
    require(delayMs >= 0 && bucketMs >= 1, "delayMs >= 0, bucketMs >= 1")
    val spanRow = df.agg(
      min(col(arrivalCol).cast("long")),
      max(col(arrivalCol).cast("long"))).head()
    val effBucket =
      if (spanRow.isNullAt(0)) bucketMs
      else {
        val span = spanRow.getLong(1) - spanRow.getLong(0) + 1L
        if (span / bucketMs >= 32L) bucketMs
        else math.max(1L, span / 1024L)
      }
    val base = df.select(col(arrivalCol).as("arr") +:
        col(tsMsCol).cast("long").as("ms") +: carryCols.map(col): _*)
      .withColumn("b", expr(s"arr div $effBucket"))
    // in-bucket strict prefix max over arrival order
    val wPrev = Window.partitionBy("b").orderBy("arr", "ms")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inb = base.withColumn("prev_in", max("ms").over(wPrev))
    // max of every EARLIER bucket (bucket count ~ time span / bucketMs)
    val btot = base.groupBy("b").agg(max("ms").as("bm"))
    val below = btot.select(col("b").as("_lb"))
      .join(btot.select(col("b").as("_hb"), col("bm")),
        col("_hb") < col("_lb"), "left")
      .groupBy(col("_lb").as("b"))
      .agg(max("bm").as("prev_below"))
    val seen = greatest(coalesce(col("prev_in"), lit(Long.MinValue)),
      coalesce(col("prev_below"), lit(Long.MinValue)))
    val lateBy = seen - lit(delayMs) - col("ms")
    inb.join(below, Seq("b"))
      .withColumn("late_by",
        when(col("prev_in").isNull && col("prev_below").isNull, lit(0L))
          .otherwise(greatest(lateBy, lit(0L))))
  }
}
