package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, 100L), // before any right row
    (2L, 10L, 205L), // between r@200 and r@300
    (3L, 10L, 300L), // exactly at r@300
    (4L, 20L, 500L)  // key with no right rows at all
  ).toDF("l_id", "k", "ts")

  private def right = Seq(
    (101L, 10L, 200L, 1.0),
    (102L, 10L, 300L, 2.0),
    (103L, 10L, 300L, 3.0), // same ts as 102 — greatest tie id wins
    (104L, 30L, 100L, 9.0)  // key absent on the left
  ).toDF("r_id", "k", "ts", "v")

  test("backward as-of: nearest ≤ ts per key, null when none") {
    val out = AsOfJoin.asOf(left, right, keys = Seq("k"),
        leftTs = "ts", rightTs = "ts", tieCol = "r_id",
        payload = Seq("r_id", "v"))
      .orderBy("l_id")
      .select("l_id", "asof_r_id", "asof_v").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2)) // l1: nothing prior
    assert(out(1).getLong(1) == 101L)                // l2: r@200
    assert(out(2).getLong(1) == 103L)                // l3: ts tie → max r_id
    assert(out(3).isNullAt(1))                       // l4: key unseen
  }

  test("strict mode hides the equal-timestamp right row") {
    val out = AsOfJoin.asOf(left, right, keys = Seq("k"),
        leftTs = "ts", rightTs = "ts", tieCol = "r_id",
        payload = Seq("r_id"), strict = true)
      .orderBy("l_id").select("l_id", "asof_r_id").collect()
    assert(out(2).getLong(1) == 101L) // l3@300: r@300 invisible, falls to r@200
  }

  test("left columns and row count are preserved exactly") {
    val out = AsOfJoin.asOf(left, right, keys = Seq("k"),
      leftTs = "ts", rightTs = "ts", tieCol = "r_id", payload = Seq("v"))
    assert(out.count() == 4)
    assert(out.columns.toSet ==
      Set("k", "ts", "l_id", "asof_v"))
  }

  test("payload column colliding with a left column is rejected") {
    val l2 = left.withColumnRenamed("l_id", "asof_v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l2, right, keys = Seq("k"), leftTs = "ts",
        rightTs = "ts", tieCol = "r_id", payload = Seq("v"))
    }
  }

  test("any reserved internal name on either input is rejected") {
    for (bad <- Seq("_ao_side", "_ao_ts", "_ao_tie", "_ao_pay")) {
      intercept[IllegalArgumentException] {
        AsOfJoin.asOf(left.withColumn(bad, lit(1)), right, keys = Seq("k"),
          leftTs = "ts", rightTs = "ts", tieCol = "r_id", payload = Seq("v"))
      }
      intercept[IllegalArgumentException] {
        AsOfJoin.asOf(left, right.withColumn(bad, lit(1)), keys = Seq("k"),
          leftTs = "ts", rightTs = "ts", tieCol = "r_id", payload = Seq("v"))
      }
    }
  }

  test("NULL payload field comes through as NULL, not a stale carry-forward") {
    // nearest right row r@200 has v = NULL; per-column carry-forward
    // would smuggle v=1.0 from the OLDER r@100 — row-atomic semantics
    // must keep (r_id=102, v=NULL) together
    val r = Seq(
      (101L, 10L, 100L, Option(1.0)),
      (102L, 10L, 200L, Option.empty[Double])
    ).toDF("r_id", "k", "ts", "v")
    val l = Seq((1L, 10L, 250L)).toDF("l_id", "k", "ts")
    val out = AsOfJoin.asOf(l, r, keys = Seq("k"), leftTs = "ts",
        rightTs = "ts", tieCol = "r_id", payload = Seq("r_id", "v"))
      .select("asof_r_id", "asof_v").head()
    assert(out.getLong(0) == 102L && out.isNullAt(1))
  }

  test("right rows with NULL timestamp have no as-of position") {
    // un-filtered, a NULL-ts right row sorts nulls-first and would leak
    // into every left row on its key
    val r = Seq(
      (101L, 10L, Option(200L), 1.0),
      (102L, 10L, Option.empty[Long], 9.0)
    ).toDF("r_id", "k", "ts", "v")
    val l = Seq((1L, 10L, 150L), (2L, 10L, 250L)).toDF("l_id", "k", "ts")
    val out = AsOfJoin.asOf(l, r, keys = Seq("k"), leftTs = "ts",
        rightTs = "ts", tieCol = "r_id", payload = Seq("r_id", "v"))
      .orderBy("l_id").select("asof_r_id", "asof_v").collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1)) // l@150: nothing ≤ 150
    assert(out(1).getLong(0) == 101L && out(1).getDouble(1) == 1.0)
  }
}
