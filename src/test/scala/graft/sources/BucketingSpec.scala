package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located join proof: two tables bucketed by the join key join with
  * NO shuffle exchange — the write-once-shuffle-never contract that
  * makes recurring fact-fact joins affordable at scale. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two same-bucketed tables plans without a shuffle") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    Bucketing.writeBucketed(li, "li_bkt", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(o, "o_bkt", Seq("o_orderkey"), 8, Seq("o_orderkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast plan so bucketing (not broadcast) avoids
      // the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readTable(spark, "li_bkt")
        .join(Bucketing.readTable(spark, "o_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the aggregation after the join shuffles on ITS key, legitimately;
      // the join keys themselves must never be exchanged
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle on the join key:\n$plan")

      // and it returns the same result as the unbucketed join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
        .as[(String, Double)].collect().toMap
      val got = joined.as[(String, Double)].collect().toMap
      assert(got.keySet == expected.keySet)
      got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-6) }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}
