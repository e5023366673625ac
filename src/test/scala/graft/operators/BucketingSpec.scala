package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft-bkt-spec").toString

  test("bucketed join runs with zero Exchange below the join and " +
    "equals the plain join") {
    val base = tmpDir()
    val left = (0L until 1000L).map(i => (i, i % 5)).toDF("k", "lv")
    val right = (0L until 400L).map(i => (i * 2, i)).toDF("rk", "rv")
    Bucketing.writeBucketed(left, "k", 4, "bspec_l", s"$base/l")
    Bucketing.writeBucketed(right, "rk", 4, "bspec_r", s"$base/r")
    // plan check on the raw join, inside the no-broadcast scope
    graft.ScopedSessionConf.withConf(spark,
      "spark.sql.autoBroadcastJoinThreshold", "-1") {
      val j = spark.table("bspec_l")
        .join(spark.table("bspec_r"), $"k" === $"rk")
      j.collect() // force execution so AQE finalizes the plan
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMB join:\n$plan")
    }
    // result equality through the operator's agg path
    val got = Bucketing.bucketedJoin(spark, "bspec_l", "bspec_r", "k", "rk") {
      _.groupBy("lv").agg(count(lit(1)).as("n"), sum("rv").as("s"))
    }.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = left.join(right, $"k" === $"rk")
      .groupBy("lv").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("writeBucketed is idempotent (re-register over an existing name)") {
    val base = tmpDir()
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Bucketing.writeBucketed(df, "k", 2, "bspec_i", s"$base/v1")
    Bucketing.writeBucketed(df, "k", 2, "bspec_i", s"$base/v2")
    assert(spark.table("bspec_i").count() == 2)
  }

  test("mismatched bucket counts still join correctly (one side " +
    "re-shuffles — degraded, never wrong)") {
    val base = tmpDir()
    val l = (0L until 100L).map(i => (i, i)).toDF("k", "lv")
    val r = (0L until 100L).map(i => (i, i * 10)).toDF("rk", "rv")
    Bucketing.writeBucketed(l, "k", 4, "bspec_m4", s"$base/l")
    Bucketing.writeBucketed(r, "rk", 2, "bspec_m2", s"$base/r")
    val got = Bucketing.bucketedJoin(spark, "bspec_m4", "bspec_m2",
      "k", "rk") { _.agg(count(lit(1)).as("n"), sum("rv").as("s")) }
      .head()
    assert(got.getLong(0) == 100L && got.getLong(1) == (0L until 100L).map(_ * 10).sum)
  }
}
