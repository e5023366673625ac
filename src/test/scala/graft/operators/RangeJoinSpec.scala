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
}
