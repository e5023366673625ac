package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) joins without the nested-loop trap.
  *
  * Spark has no equi key for `p.ts BETWEEN iv.lo AND iv.hi`, so it
  * plans the join as BroadcastNestedLoopJoin (or worse, cartesian) —
  * O(|points|·|intervals|) at 100 TB. Bucketizing manufactures the
  * equi key: every interval explodes into the fixed-width buckets it
  * covers, every point maps to its single bucket, the join becomes a
  * plain hash equi-join on bucket, and the exact BETWEEN predicate
  * filters within-bucket false positives as a join residual.
  *
  * Each (point, interval) match surfaces exactly ONCE — the point
  * lives in exactly one bucket — so there is no dedup pass. Bucket
  * width tunes replication vs probe selectivity: wide buckets → few
  * interval replicas, more false-positive probes; narrow → opposite.
  * Size it near the typical interval length.
  *
  * Intervals with lo > hi match nothing (SQL BETWEEN semantics) and
  * are dropped before the explode — `sequence(a, b)` would otherwise
  * DESCEND and replicate them everywhere.
  */
object RangeJoin {

  /** Join `points` (numeric `ptCol`) to `intervals` ([loCol, hiCol],
    * inclusive) on containment. Output: point columns ++ interval
    * columns, one row per containment match. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("_rj_bucket",
      expr(s"$ptCol DIV $bucketWidth"))
    val ib = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_rj_bucket",
        explode(sequence(expr(s"$loCol DIV $bucketWidth"),
          expr(s"$hiCol DIV $bucketWidth"))))
    pb.join(ib, Seq("_rj_bucket"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_rj_bucket")
  }
}
