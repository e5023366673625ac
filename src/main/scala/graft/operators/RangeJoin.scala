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
  * DESCEND and replicate them everywhere. An interval spanning more
  * than `maxBucketsPerInterval` buckets fails the job loudly: a
  * sentinel hi (Long.MaxValue as "still open") would otherwise ask
  * sequence() for ~10^12 elements and kill executors at scale —
  * widen the bucket or cap the interval instead.
  *
  * Bucketing uses floor division on doubles — monotone, so coverage
  * is correct for negative values too; magnitudes must stay within
  * double's exact-integer range (|v| < 2^53 — any epoch-ms/µs fits).
  */
object RangeJoin {

  /** Join `points` (numeric `ptCol`) to `intervals` ([loCol, hiCol],
    * inclusive) on containment. Output: point columns ++ interval
    * columns, one row per containment match. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 100000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucket(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / lit(bucketWidth.toDouble)).cast("long")
    val pb = points.withColumn("_rj_bucket", bucket(col(ptCol)))
    val ib = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_rj_lo", bucket(col(loCol)))
      .withColumn("_rj_hi", bucket(col(hiCol)))
      .withColumn("_rj_bucket", explode(sequence(col("_rj_lo"),
        when(col("_rj_hi") - col("_rj_lo") < maxBucketsPerInterval,
          col("_rj_hi"))
          .otherwise(raise_error(concat_ws("",
            lit(s"range join interval spans > $maxBucketsPerInterval " +
              s"buckets of width $bucketWidth: ["),
            col(loCol).cast("string"), lit(", "),
            col(hiCol).cast("string"), lit("]")))))))
      .drop("_rj_lo", "_rj_hi")
    pb.join(ib, Seq("_rj_bucket"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_rj_bucket")
  }
}
