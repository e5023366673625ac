package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class WindowedAggSpec extends SparkSpec {
  import spark.implicits._

  // base 1200 = a window boundary (tumbling windows align to epoch 0)
  private case class Ev(ts: Timestamp, k: String, v: Double)
  private def ev(sec: Long, k: String, v: Double) =
    Ev(new Timestamp((1200 + sec) * 1000), k, v)

  test("tumbling windows: in-lateness events fold in, later-than-watermark dropped") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = WindowedAgg.tumbling(input.toDF(), "ts", "k", "v",
      windowDur = "60 seconds", allowedLateness = "30 seconds")
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(ev(10, "a", 1.0), ev(20, "a", 2.0))
      q.processAllAvailable() // watermark → 20-30 < 0 (clamped)
      // late event at 30 ≥ watermark: folds into its window; 70 opens next
      input.addData(ev(30, "a", 8.0), ev(70, "a", 4.0))
      q.processAllAvailable() // watermark → 70-30 = 40
      input.addData(ev(200, "a", 16.0)) // wm → 170: [0,60) & [60,120) finalize
      q.processAllAvailable()
      input.addData(ev(5, "a", 32.0)) // 5 ≪ watermark 170: dropped
      input.addData(ev(400, "a", 0.0)) // wm → 370: [180,240) finalizes
      q.processAllAvailable()

      val rows = spark.table("winagg")
        .select($"window_start".cast("long") - 1200, $"n", $"total")
        .as[(Long, Long, Double)].collect()
        .map { case (w, n, t) => w -> (n, t) }.toMap
      // [0,60): events at 10,20 + late 30 folded in; dropped 5 NOT counted
      assert(rows(0L) == (3L, 11.0))
      // [60,120): the single event at 70
      assert(rows(60L) == (1L, 4.0))
      // [180,240): event at 200, finalized by the last watermark push
      assert(rows(180L) == (1L, 16.0))
    } finally q.stop()
  }

  test("moving avg: trailing RANGE frame, same-ms peers always included") {
    import org.apache.spark.sql.functions.col
    val events = Seq(
      (1L, 10L, 0L, 10.0),     // user 10, t=0
      (2L, 10L, 1000L, 20.0),  // t=1s: within 2s of t=0
      (3L, 10L, 5000L, 30.0),  // t=5s: alone in its 2s trail
      (4L, 10L, 5000L, 50.0),  // same ms as event 3 — peer row
      (5L, 11L, 0L, 99.0)      // other key
    ).toDF("event_id", "user_id", "ms0", "value")
      .select(col("event_id"), col("user_id"),
        org.apache.spark.sql.functions.timestamp_millis(col("ms0")).as("ts"),
        col("value"))
    val got = WindowedAgg.movingAvg(events, "ts", "user_id", "value",
        windowMs = 2000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got(1L) == ((1L, 10.0)))
    assert(got(2L) == ((2L, 15.0)))
    // events 3 and 4 share t=5000: RANGE includes BOTH for both rows
    assert(got(3L) == ((2L, 40.0)) && got(4L) == ((2L, 40.0)))
    assert(got(5L) == ((1L, 99.0)), "keys are independent")
  }

  test("TWAP: basic weighting, last observation contributes nothing") {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    // v=10 held 1 s, v=30 held 3 s, v=99 open-ended (no weight)
    val events = Seq(
      (1L, 10L, 0L, 10.0), (2L, 10L, 1000L, 30.0), (3L, 10L, 4000L, 99.0)
    ).toDF("event_id", "user_id", "ms0", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_millis(col("ms0")).as("ts"), col("value"))
    val r = WindowedAgg.timeWeightedAvg(events, "ts", "user_id", "value")
      .head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 4000L)
    assert(r.getDouble(3) == 25.0, s"(10*1+30*3)/4 = 25, got ${r.getDouble(3)}")
  }

  test("TWAP same-timestamp tiebreak: lead orders by (ms, id), zero-duration first") {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    def twap(rows: Seq[(Long, Long, Long, Double)]): Double = {
      val df = rows.toDF("event_id", "user_id", "ms0", "value")
        .select(col("event_id"), col("user_id"),
          timestamp_millis(col("ms0")).as("ts"), col("value"))
      WindowedAgg.timeWeightedAvg(df, "ts", "user_id", "value")
        .head().getDouble(3)
    }
    // ids 1,2 share t=1000: the LOWER id holds for 0 ms (lead goes to
    // its same-ms peer), the higher id holds until t=2000 — so only
    // id 2's value carries weight
    val a = twap(Seq(
      (1L, 10L, 1000L, 10.0), (2L, 10L, 1000L, 20.0), (3L, 10L, 2000L, 30.0)))
    assert(a == 20.0, s"same-ms tie: higher id's value holds, got $a")
    // swap which id carries which value → the OTHER value wins,
    // proving the tiebreak is the id order, not arrival/row order
    val b = twap(Seq(
      (2L, 10L, 1000L, 10.0), (1L, 10L, 1000L, 20.0), (3L, 10L, 2000L, 30.0)))
    assert(b == 10.0, s"tiebreak must follow id, got $b")
    // and the zero-duration interval still counts as an interval
    // (n_intervals = 2) with span unchanged — exact integer arithmetic
    val df = Seq(
      (1L, 10L, 1000L, 10.0), (2L, 10L, 1000L, 20.0), (3L, 10L, 2000L, 30.0)
    ).toDF("event_id", "user_id", "ms0", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_millis(col("ms0")).as("ts"), col("value"))
    val r = WindowedAgg.timeWeightedAvg(df, "ts", "user_id", "value").head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 1000L)
  }
}
