package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedSumDSpec extends SparkSpec {
  import spark.implicits._

  test("sorted_sum_d equals the sorted sequential fold, bit-exactly") {
    // values chosen so naive summation order changes the ULPs
    val vals = Seq(1e16, 1.0, -1e16, 3.0, 1e-3, 7.0, -2.5, 1e12, -1e12)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong % 3, v) }
      .toDF("g", "v")
    val got = df.groupBy("g").agg(SortedSumD(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = vals.zipWithIndex.groupBy(_._2 % 3).map { case (g, vs) =>
      g.toLong -> vs.map(_._1).sorted.foldLeft(0.0)(_ + _)
    }
    assert(got == expect)
  }

  test("deterministic under any partitioning and row order") {
    val vals = (1 to 4000).map(i => math.sin(i.toDouble) * math.pow(10, i % 14))
    val df = vals.map(("k", _)).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(SortedSumD(col("v")).as("s"))
        .collect().head.getDouble(1)
    val a = run(df)
    val b = run(df.repartition(17))
    val c = run(df.orderBy(col("v").desc))
    // bit-identical, not approx: the whole point of the sorted fold
    assert(java.lang.Double.doubleToLongBits(a) ==
      java.lang.Double.doubleToLongBits(b))
    assert(java.lang.Double.doubleToLongBits(a) ==
      java.lang.Double.doubleToLongBits(c))
    // the merge path (partial buffers concat) hits at 17 partitions and
    // still agrees with a single-partition run
    val d = run(df.coalesce(1))
    assert(java.lang.Double.doubleToLongBits(a) ==
      java.lang.Double.doubleToLongBits(d))
  }

  test("nulls skipped; all-null group sums to null") {
    val df = Seq((1L, Some(2.0)), (1L, None), (2L, None))
      .toDF("g", "v")
    val rows = df.groupBy("g").agg(SortedSumD(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(rows == Map(1L -> Some(2.0), 2L -> None))
  }

  test("works as a window aggregate (RANGE frame)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("ms").rangeBetween(-10, 0)
    val df = Seq((1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 20L, 4.0))
      .toDF("g", "ms", "v")
    val got = df.select(col("ms"), SortedSumD(col("v")).over(w).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(0L -> 1.0, 5L -> 3.0, 20L -> 4.0))
  }

  test("x69's plan carries no collect_list (the fold is one native agg)") {
    val nodes = (1L to 5L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val plan = graft.operators.GraphRank
      .pageRank(nodes, "id", edges, iters = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), "fold must not buffer boxed rows")
    assert(plan.contains("sorted_sum_d"), "fold must be the native agg")
  }
}
