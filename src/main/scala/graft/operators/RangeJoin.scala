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

  private def bucketCol(c: org.apache.spark.sql.Column,
                        bucketWidth: Long) =
    floor(c.cast("double") / lit(bucketWidth.toDouble)).cast("long")

  /** Explode a frame's [lo, hi] into its covered buckets as
    * `_rj_bucket`, with the span valve (see object scaladoc). */
  private def explodeBuckets(df: DataFrame, loCol: String, hiCol: String,
                             bucketWidth: Long,
                             maxBucketsPerInterval: Int): DataFrame =
    df.filter(col(loCol) <= col(hiCol))
      .withColumn("_rj_lo", bucketCol(col(loCol), bucketWidth))
      .withColumn("_rj_hi", bucketCol(col(hiCol), bucketWidth))
      .withColumn("_rj_bucket", explode(sequence(col("_rj_lo"),
        when(col("_rj_hi") - col("_rj_lo") < maxBucketsPerInterval,
          col("_rj_hi"))
          .otherwise(raise_error(concat_ws("",
            lit(s"range join interval spans > $maxBucketsPerInterval " +
              s"buckets of width $bucketWidth: ["),
            col(loCol).cast("string"), lit(", "),
            col(hiCol).cast("string"), lit("]")))))))
      .drop("_rj_lo", "_rj_hi")

  /** Join `points` (numeric `ptCol`) to `intervals` ([loCol, hiCol],
    * inclusive) on containment. Output: point columns ++ interval
    * columns, one row per containment match. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 100000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("_rj_bucket",
      bucketCol(col(ptCol), bucketWidth))
    val ib = explodeBuckets(intervals, loCol, hiCol, bucketWidth,
      maxBucketsPerInterval)
    pb.join(ib, Seq("_rj_bucket"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_rj_bucket")
  }

  /** INTERVAL-overlap join: [llo, lhi] × [rlo, rhi] matched when the
    * closed intervals intersect (llo ≤ rhi ∧ rlo ≤ lhi) — temporal
    * overlap joins, span-vs-span conflict detection. Same bucket
    * manufacture as [[pointInInterval]], but BOTH sides explode; a pair
    * sharing n buckets would surface n times, so matches are kept only
    * in their CANONICAL bucket — the bucket of the overlap's start,
    * max(llo, rlo), which both sides cover by definition — making the
    * output exactly-once with no dedup shuffle. Column names must not
    * collide across the two sides. */
  def intervalOverlap(left: DataFrame, lloCol: String, lhiCol: String,
                      right: DataFrame, rloCol: String, rhiCol: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 100000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"intervalOverlap needs disjoint column names; shared: $shared")
    val lb = explodeBuckets(left, lloCol, lhiCol, bucketWidth,
      maxBucketsPerInterval)
    val rb = explodeBuckets(right, rloCol, rhiCol, bucketWidth,
      maxBucketsPerInterval)
    lb.join(rb, Seq("_rj_bucket"))
      .filter(col(lloCol) <= col(rhiCol) && col(rloCol) <= col(lhiCol))
      .filter(col("_rj_bucket") ===
        bucketCol(greatest(col(lloCol), col(rloCol)), bucketWidth))
      .drop("_rj_bucket")
  }
}
