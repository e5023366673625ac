package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Ranked contract: global-rank windows run only over frames that
  * are provably small, and they do so without tripping WindowExec's
  * single-partition alarm — so that alarm stays meaningful for any
  * window that is accidentally global. */
class RankedSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 100).map(i => (i.toLong, (i * 37 % 101)))
    .toDF("id", "score")

  test("rankBounded input is limit-bounded (TakeOrderedAndProject)") {
    val out = Ranked.rankBounded(df, 7, Seq(col("score").desc, col("id")))
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"),
      s"rank input must be a top-k, not a global sort:\n$physical")
  }

  test("bounded window keeps its partition key through the optimizer") {
    val out = Ranked.rankBounded(df, 7, Seq(col("score").desc, col("id")))
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: logical.Window => w }
    assert(windows.nonEmpty, "expected a Window node in the plan")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        "constant partition key was optimized away — the WindowExec " +
          "single-partition warning would re-arm on a benign site")
    }
  }

  test("ranks match the plain global window") {
    val sort = Seq(col("score").desc, col("id").asc)
    val got = Ranked.rankBounded(df, 10, sort)
      .select("id", "rn").as[(Long, Int)].collect().sortBy(_._1)
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(sort: _*)))
      .filter(col("rn") <= 10)
      .select("id", "rn").as[(Long, Int)].collect().sortBy(_._1)
    assert(got.sameElements(want))
  }

  test("bounded() spec ranks a one-row-per-group aggregate identically") {
    val grouped = df.groupBy((col("id") % 5).as("g"))
      .agg(sum("score").as("tot"))
    val got = grouped.withColumn("i",
        row_number().over(Ranked.bounded(col("tot"), col("g"))))
      .select("g", "i").as[(Long, Int)].collect().sortBy(_._1)
    val want = grouped.withColumn("i",
        row_number().over(Window.orderBy(col("tot"), col("g"))))
      .select("g", "i").as[(Long, Int)].collect().sortBy(_._1)
    assert(got.sameElements(want))
  }
}
