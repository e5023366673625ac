package graft

import org.apache.spark.sql.functions._

/** The driver's smoke contract: `SparkEntry.entry` returns rows on
  * sf0.001, and its star join broadcasts the dimension sides. */
class EntrySpec extends SparkSpec {

  test("flagship entry returns per-region revenue, dims broadcast") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length == 5) // five regions
    assert(rows.map(_.getAs[Double]("revenue")).forall(_ > 0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims should broadcast")
  }

  test("every catalog query runs at sf0.001 (smoke)") {
    val skipSlow = Set("x11_stream_merge") // streaming covered by its spec
    SparkEntry.queries.filterNot(q => skipSlow(q._1)).foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name)
    }
  }
}
