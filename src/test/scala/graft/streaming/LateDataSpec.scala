package graft.streaming

import graft.SparkSpec

class LateDataSpec extends SparkSpec {
  import spark.implicits._

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
}
