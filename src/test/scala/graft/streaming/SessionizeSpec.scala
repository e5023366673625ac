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
}
