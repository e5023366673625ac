package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("key", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4)))
      .toSeq

  test("scd2: runs merge, changes open intervals, last is current") {
    val snap = Seq(
      (1L, 1, "A"), (1L, 2, "A"), (1L, 3, "B"), (1L, 5, "B"), (1L, 7, "A"),
      (2L, 2, "X")
    ).toDF("key", "batch", "status")
    val got = collect(
      Scd2.history(snap, "key", "batch", Seq("status"))
        .select("key", "status", "valid_from", "valid_to", "is_current"))
    assert(got == Seq(
      (1L, "A", 1, 3, false),  // batches 1-2 merge into one interval
      (1L, "B", 3, 7, false),  // batches 3 and 5 merge; closed by 7
      (1L, "A", 7, -1, true),  // reverting to A is a NEW interval
      (2L, "X", 2, -1, true)))
  }

  test("scd2: null-safe attribute comparison") {
    val snap = Seq[(Long, Int, Option[String])](
      (1L, 1, None), (1L, 2, None), (1L, 3, Some("A")), (1L, 4, None)
    ).toDF("key", "batch", "status")
    val got = Scd2.history(snap, "key", "batch", Seq("status"))
      .orderBy("valid_from")
      .collect().map(r => (r.getInt(2), r.isNullAt(1)))
    // null==null merges (1,2); null→A and A→null are changes
    assert(got.toSeq == Seq((1, true), (3, false), (4, true)))
  }

  test("scd2: multi-attribute change detection, empty attrs rejected") {
    val snap = Seq(
      (1L, 1, "A", 10), (1L, 2, "A", 20), (1L, 3, "A", 20)
    ).toDF("key", "batch", "status", "n")
    val got = Scd2.history(snap, "key", "batch", Seq("status", "n"))
      .orderBy("valid_from").collect()
    assert(got.length == 2) // n changed at batch 2, merged at 3
    intercept[IllegalArgumentException] {
      Scd2.history(snap, "key", "batch", Seq.empty)
    }
  }

  test("scd2: one shuffle reused by both windows (no second exchange)") {
    val snap = Seq((1L, 1, "A"), (1L, 2, "B")).toDF("key", "batch", "status")
    val plan = Scd2.history(snap, "key", "batch", Seq("status"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1,
      s"expected at most one shuffle:\n$plan")
  }
}
