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
}
