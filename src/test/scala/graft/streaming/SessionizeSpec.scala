package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._
  import Sessionize._

  // +1000s base: an event at exactly epoch 0 sits on the initial
  // watermark and is discarded as late
  private def ev(uid: Long, sec: Long, v: Double) =
    Event(uid, new Timestamp((1000 + sec) * 1000), v)

  test("streaming sessionization: gap splits sessions, watermark flushes state") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = sessionize(
      input.toDS().withWatermark("ts", "10 seconds").as[Event],
      gapMs = 30 * 1000)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // user 1: two events 10s apart (one session), then a 100s gap
      input.addData(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(2, 5, 5.0))
      q.processAllAvailable()
      // next batch: event far past the gap → closes session 1 for user 1,
      // and advances the watermark far enough to time out user 2
      input.addData(ev(1, 500, 3.0))
      q.processAllAvailable()
      input.addData(ev(1, 2000, 4.0)) // watermark → 1990s, times out all open
      q.processAllAvailable()
      input.addData(ev(9, 4000, 0.0)) // one more batch so timeouts fire
      q.processAllAvailable()

      val got = spark.table("sessions")
        .select($"user_id", $"n_events", $"total_value").as[(Long, Long, Double)]
        .collect().toSet
      // user 1 session A: events at 0,10 (n=2, total=3); session B: 500 (n=1)
      assert(got.contains((1L, 2L, 3.0)))
      assert(got.contains((1L, 1L, 3.0)))
      // user 2 single-event session flushed by timeout
      assert(got.contains((2L, 1L, 5.0)))

      // batch vs streaming on the same events (shared foldSessions):
      // the x20 oracle checks the batch path against SQL; this closes
      // the loop back to streaming. Streaming emits a strict subset —
      // the final event's session (user 9) is still open, waiting on a
      // watermark that never comes; batch flushes it at end-of-input.
      val batch = sessionizeBatch(
        Seq(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(2, 5, 5.0), ev(1, 500, 3.0),
          ev(1, 2000, 4.0), ev(9, 4000, 0.0)).toDS(), gapMs = 30 * 1000)
        .select($"user_id", $"session_start", $"session_end", $"n_events",
          $"total_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      val streamed = spark.table("sessions")
        .select($"user_id", $"session_start", $"session_end", $"n_events",
          $"total_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(streamed.subsetOf(batch))
      assert((batch -- streamed).map(_._1) == Set(9L),
        "batch and streaming must agree on every watermark-flushed session")
    } finally q.stop()
  }

  test("native session_window stream: gap >= splits, watermark " +
    "emits closed sessions, end = last + gap") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = input.toDS()
      .withWatermark("ts", "10 seconds")
      .select(col("user_id"), col("ts"),
        floor(col("value") * lit(10000.0) + lit(0.5)).cast("long")
          .as("vq"))
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col("vq")).as("sq"))
      .select(col("user_id"), unix_millis(col("sw.start")).as("start_ms"),
        unix_millis(col("sw.end")).as("end_ms"), col("n_events"),
        (col("sq").cast("double") / lit(10000.0)).as("total_value"))
    val q = agg.writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(2, 5, 5.0))
      q.processAllAvailable()
      input.addData(ev(1, 500, 3.0)) // watermark 490s: flushes both
      q.processAllAvailable()
      input.addData(ev(9, 2000, 0.0)) // advances watermark past 530s
      q.processAllAvailable()
      input.addData(ev(9, 4000, 0.0))
      q.processAllAvailable()
      val got = spark.table("native_sessions")
        .select($"user_id", $"start_ms", $"end_ms", $"n_events",
          $"total_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      // user 1 session A: [1000s, 1010s+30s) n=2 total=3.0
      assert(got.contains((1L, 1000000L, 1040000L, 2L, 3.0)), got.toString)
      // user 2 single event: end = ts + gap
      assert(got.contains((2L, 1005000L, 1035000L, 1L, 5.0)))
      // user 1 session B closed by the later watermark
      assert(got.contains((1L, 1500000L, 1530000L, 1L, 3.0)))
    } finally q.stop()
  }

  test("native session_window vs custom fold: identical break rule " +
    "(merge at == gap, break past it), end differs by exactly +gap") {
    // gaps of exactly 30s (merges — the built-in extends the window
    // THROUGH prev+gap inclusive, same as the custom fold's <= rule)
    // and 31s (breaks)
    val events = Seq(ev(1, 0, 1.0), ev(1, 30, 1.0), ev(1, 61, 1.0)).toDS()
    val native = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 seconds")
        .as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("sw.start")).as("s"),
        unix_millis(col("sw.end")).as("e"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(native.map(_._3) == Seq(2L, 1L)) // {0,30} | {61}
    val custom = sessionizeBatch(events, gapMs = 30 * 1000)
      .select(unix_millis(col("session_start")),
        unix_millis(col("session_end")), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(custom.map(_._3) == native.map(_._3))
    assert(custom.map(_._1) == native.map(_._1)) // same session starts
    // native end = last event + gap; custom end = last event
    assert(native.map(_._2) == custom.map(_._2).map(_ + 30000L))
  }
}
