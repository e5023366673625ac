package graft.streaming

import graft.SparkSpec

class LateDataSpec extends SparkSpec {
  import spark.implicits._

  private case class Arr(id: Long, ts: java.sql.Timestamp)

  // (arrival, event-ms, group): row 3 arrives after the watermark has
  // advanced past it by 140 ms; row 4 is out of order but inside delay
  private lazy val rows = Seq(
    (0L, 100L, "a"),
    (1L, 200L, "a"),
    (2L, 50L, "a"),  // seen=200, delay 10 → 140 ms late
    (3L, 195L, "a"), // seen=200, within delay → on time
    (4L, 300L, "b")  // fresh max, on time
  ).toDF("arr", "ms", "g")

  test("lateArrivalAudit: per-row watermark decision matches the " +
    "hand-computed stream replay") {
    val got = LateData.lateArrivalAudit(rows, "arr", "ms", "g",
        delayMs = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got("a") == ((4L, 1L, 0.25, 140L)))
    assert(got("b") == ((1L, 0L, 0.0, 0L)), "a new max is never late")
  }

  test("lateArrivalAudit: the global first arrival is never late, and " +
    "a zero delay marks every backward step") {
    val got = LateData.lateArrivalAudit(rows, "arr", "ms", "g",
        delayMs = 0L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4))).toMap
    // rows 3 (50 < 200) and 4 (195 < 200) are both behind the max
    assert(got("a") == ((2L, 150L)))
    assert(got("b") == ((0L, 0L)))
  }

  test("lateArrivalAudit predicts Structured Streaming's ACTUAL drop " +
    "set: a real watermarked stream over the same arrival order keeps " +
    "exactly total - n_late rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import java.sql.Timestamp
    // one row per micro-batch so Spark's batch-boundary watermark (max
    // prior event time - delay) coincides with the audit's per-arrival
    // rule; ts values avoid the exact wm boundary so strictness
    // conventions cannot flip a row
    val seq = Seq( // (id, event-second): rows 90 and 150 arrive late
      (1L, 100L), (2L, 130L), (3L, 90L), (4L, 125L),
      (5L, 300L), (6L, 150L), (7L, 305L))
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Arr]
    val q = input.toDF()
      .withWatermark("ts", "10 seconds")
      .dropDuplicates("id")
      .writeStream.format("memory").queryName("latedrop")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      seq.foreach { case (id, s) =>
        input.addData(Arr(id, new Timestamp(s * 1000)))
        q.processAllAvailable()
      }
    } finally q.stop()
    val kept = spark.table("latedrop").count()
    val audit = LateData.lateArrivalAudit(
      seq.zipWithIndex.map { case ((id, s), i) => (i.toLong, s * 1000, "g") }
        .toDF("arr", "ms", "g"),
      "arr", "ms", "g", delayMs = 10000L).head()
    assert(audit.getAs[Long]("n_late") == 2L, "fixture sanity")
    assert(kept == seq.size - audit.getAs[Long]("n_late"),
      s"stream kept $kept rows; audit predicted ${seq.size} - 2")
  }

  test("lateRows: the quarantine face emits exactly the audit's late " +
    "rows with their margins, carrying triage columns") {
    val got = LateData.lateRows(rows, "arr", "ms", Seq("g"),
        delayMs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    // only arrival 2 (ms=50 against watermark 200-10) is late, by 140
    assert(got.toSeq == Seq((2L, 50L, "a", 140L)))
    val audit = LateData.lateArrivalAudit(rows, "arr", "ms", "g", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got.length.toLong == audit.values.sum,
      "quarantine row count == audit n_late across groups")
  }

  test("lateArrivalAudit: bucket boundaries do not change the result " +
    "(two-level prefix max == single-window truth); layout independent") {
    val many = (0L until 400L).map { i =>
      // sawtooth event times force cross-bucket watermark carries
      (i, i * 7 % 113 + (i / 13) * 50, if (i % 3 == 0) "x" else "y")
    }.toDF("arr", "ms", "g")
    def run(bucket: Long, parts: Int) =
      LateData.lateArrivalAudit(many.repartition(parts), "arr", "ms", "g",
          delayMs = 25L, bucketMs = bucket)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(4))).toSet
    val tiny = run(bucket = 3L, parts = 7)
    assert(tiny == run(bucket = 1000000L, parts = 2),
      "bucketing is an implementation detail, not a semantics change")
    assert(tiny.exists(_._3 > 0), "the sawtooth must produce late rows")
  }

  test("lateArrivalAudit: a sequence-number arrival column under the " +
    "default day-in-millis bucket width is re-bucketed, same results") {
    // 400 small-integer sequence arrivals: arr div 86400000 would put
    // EVERY row in bucket 0 (the one-bucket global window the class
    // promises to avoid); the span check re-derives the width, and the
    // answer equals an explicitly well-scaled run
    val many = (0L until 400L).map { i =>
      (i, i * 7 % 113 + (i / 13) * 50, if (i % 3 == 0) "x" else "y")
    }.toDF("arr", "ms", "g")
    def run(bucket: Long) =
      LateData.lateArrivalAudit(many, "arr", "ms", "g",
          delayMs = 25L, bucketMs = bucket)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(4))).toSet
    assert(run(86400000L) == run(3L),
      "the default width over sequence numbers must not change results" +
        " (and must not degenerate to one bucket)")
  }
}
