package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

// top-level: Spark can't derive an Encoder for a class nested in the
// spec instance
case class StreamDedupEv(event_id: Long, ts: Timestamp, value: Double)

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, sec: Long, v: Double) =
    StreamDedupEv(id, new Timestamp((1000 + sec) * 1000), v)

  test("redelivered events within the watermark dedup to one, " +
    "even with re-stamped timestamps") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StreamDedupEv]
    val deduped = StreamDedup.dedupWithinWatermark(
      input.toDF(), "ts", "30 seconds", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(ev(1, 0, 1.0), ev(2, 5, 2.0))
      q.processAllAvailable()
      // batch 2: event 1 redelivered with a RE-STAMPED ts (+3 s) — a
      // (key, ts) dropDuplicates would pass it; within-watermark dedup
      // must not. event 3 is genuinely new.
      input.addData(ev(1, 3, 1.0), ev(3, 8, 3.0))
      q.processAllAvailable()
      val got = spark.table("sdedup")
        .select($"event_id").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 3L), got.mkString(","))
    } finally q.stop()
  }

  test("batch frame degrades to whole-history dropDuplicates (backfill path)") {
    val batch = Seq(ev(1, 0, 1.0), ev(1, 3, 1.0), ev(2, 5, 2.0)).toDF()
    val got = StreamDedup.dedupWithinWatermark(batch, "ts", "30 seconds",
      Seq("event_id")).select($"event_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }
}
