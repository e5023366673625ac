package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = (0L to 100L).map(p => (p, p * 10)).toDF("pid", "pt")
  private lazy val intervals = Seq(
    (1L, 15L, 34L),    // covers pts 20, 30
    (2L, 500L, 505L),  // covers pt 500 only
    (3L, 990L, 2000L), // runs past the data: pt 990, 1000
    (4L, 50L, 40L)     // inverted: matches nothing (BETWEEN semantics)
  ).toDF("iv_id", "lo", "hi")

  test("bucketized range join equals the naive BETWEEN join, once per match") {
    Seq(7L, 100L, 1000L).foreach { width => // width smaller/near/larger than intervals
      val got = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi",
        bucketWidth = width)
        .select($"iv_id", $"pid").as[(Long, Long)].collect().toSeq
      val naive = points.join(intervals, $"pt" >= $"lo" && $"pt" <= $"hi")
        .select($"iv_id", $"pid").as[(Long, Long)].collect().toSeq
      assert(got.sorted == naive.sorted, s"width=$width")
      assert(got.size == got.toSet.size, s"width=$width: no duplicate matches")
    }
  }

  test("an interval spanning too many buckets fails loudly, not with OOM") {
    val openEnded = Seq((9L, 0L, Long.MaxValue / 2)).toDF("iv_id", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", openEnded, "lo", "hi",
        bucketWidth = 10L, maxBucketsPerInterval = 1000).count()
    }
    assert(e.getMessage != null)
  }

  test("range join plans as a hash equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi",
      bucketWidth = 100L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("interval overlap == naive predicate join, exactly-once, equi-join plan") {
    val a = Seq((1L, 0L, 100L), (2L, 250L, 260L), (3L, 500L, 900L),
      (4L, 905L, 904L)) // inverted: matches nothing
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 50L, 120L), (11L, 90L, 300L), (12L, 600L, 700L),
      (13L, 901L, 1000L)).toDF("b_id", "b_lo", "b_hi")
    Seq(7L, 100L, 1000L).foreach { width =>
      val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi",
          b, "b_lo", "b_hi", bucketWidth = width)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
      val naive = a.filter($"a_lo" <= $"a_hi")
        .join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
      assert(got.sorted == naive.sorted, s"width=$width")
      assert(got.size == got.toSet.size,
        s"width=$width: canonical-bucket emission must be exactly-once")
    }
    val plan = RangeJoin.intervalOverlap(a, "a_lo", "a_hi",
        b, "b_lo", "b_hi", bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, "a_lo", "a_hi",
        a.withColumnRenamed("a_id", "x"), "a_lo", "a_hi", 10L)
    }
  }
}
