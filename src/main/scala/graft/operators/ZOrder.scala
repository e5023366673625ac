package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout for
  * parquet min/max skipping, the Delta/Iceberg OPTIMIZE ZORDER BY
  * re-expressed over plain parquet.
  *
  * Why it matters at 100 TB: a table sorted by one column prunes scans
  * on THAT column only; a fact table queried by part OR supplier OR
  * (part, supplier) needs its row groups to be compact in BOTH
  * dimensions at once. Interleaving the bits of the (min-max
  * normalized) key columns gives a 1-D sort key whose contiguous ranges
  * are axis-aligned-ish tiles of the key space, so every file's
  * per-column min/max footprint is narrow in every clustered dimension
  * — and the engine's ordinary parquet stats pruning does the rest. No
  * reader cooperation needed: the layout pays off for any engine that
  * reads footers.
  *
  * Everything is integer arithmetic over builtins (shiftright / &,
  * shiftleft / bitwise or), codegen'd end to end and portable to the
  * DuckDB oracle bit for bit.
  */
object ZOrder {

  /** Min-max normalize a long column into [0, 2^bits):
    * floor((v−min)·(2^bits−1) / (max−min)). The product is exact 64-bit
    * integer math; the division runs in IEEE double (both engines) and
    * is bit-identical as long as the product stays below 2^53 — the
    * caller-guaranteed bound (bits=16 over any range < 2^37 is safe;
    * scale `bits` down for wider key ranges). Degenerate range
    * (min == max) maps to 0. */
  def normalize(v: Column, minV: Long, maxV: Long, bits: Int): Column =
    if (maxV == minV) lit(0L)
    else floor(((v.cast("long") - lit(minV)) * lit((1L << bits) - 1))
      .cast("double") / lit((maxV - minV).toDouble)).cast("long")

  /** Morton z-value of already-normalized columns (each in
    * [0, 2^bits)): bit i of column c lands at position i·n + c. Unrolled
    * to bits·n codegen'd shift/mask terms — no UDF, no loop at runtime.
    * n·bits must stay ≤ 63 so the z fits a long. */
  def zValue(normCols: Seq[Column], bits: Int = 16): Column = {
    val n = normCols.length
    require(n >= 1, "zValue needs at least one column")
    require(n * bits <= 63, s"$n cols × $bits bits exceeds a long")
    val terms = for {
      i <- 0 until bits
      (c, ci) <- normCols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value over RAW long columns with their (min, max) ranges —
    * normalize then interleave. Ranges come from one O(#cols) stats
    * aggregation (the k-means-centroid pattern: tiny driver data that
    * parameterizes the plan as literals). */
  def zValueRanged(cols: Seq[(Column, (Long, Long))],
                   bits: Int = 16): Column =
    zValue(cols.map { case (c, (lo, hi)) => normalize(c, lo, hi, bits) },
      bits)

  /** Collect per-column (min, max) in ONE aggregation job. Fails with
    * a descriptive error (not an opaque NPE) on an empty frame or an
    * all-null column — min/max return null for both. */
  def ranges(df: DataFrame, colNames: Seq[String]): Seq[(Long, Long)] = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    colNames.zipWithIndex.map { case (c, i) =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"ZOrder.ranges: column '$c' has no non-null values " +
          "(empty input or all-null column) — nothing to cluster")
      (row.getLong(2 * i), row.getLong(2 * i + 1))
    }
  }

  /** Rewrite `df` z-clustered on `colNames` into `numFiles` files:
    * range-partition by z (disjoint z-ranges per file = disjoint tiles
    * of the key space), sort within each, write. The returned frame is
    * the one to `.write.parquet(...)` — kept separate from the write so
    * callers compose it with their own sink (partitioning, versioned
    * publish, ...). */
  def cluster(df: DataFrame, colNames: Seq[String], numFiles: Int,
              bits: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val rs = ranges(df, colNames)
    val z = zValueRanged(colNames.map(col).zip(rs), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** SQL mirror of [[zValue]] over already-normalized column NAMES —
    * generated from the same bit-position constants so engines cannot
    * drift (the catalog's shared-fragment rule). */
  def interleaveSql(normNames: Seq[String], bits: Int = 16): String = {
    val n = normNames.length
    (for {
      i <- 0 until bits
      (name, ci) <- normNames.zipWithIndex
    } yield s"((($name >> $i) & 1) << ${i * n + ci})").mkString(" | ")
  }

  /** The DuckDB mirror of [[normalize]] + [[zValue]] over raw columns
    * with CONSTANT ranges (for SQL with ranges known at build time;
    * oracles that derive ranges in a CTE normalize inline and use
    * [[interleaveSql]]). */
  def zSql(cols: Seq[(String, (Long, Long))], bits: Int = 16): String = {
    val n = cols.length
    val terms = for {
      i <- 0 until bits
      ((name, (lo, hi)), ci) <- cols.zipWithIndex
    } yield {
      val norm = if (hi == lo) "0"
        else s"CAST(floor(CAST((CAST($name AS BIGINT) - $lo) * " +
          s"${(1L << bits) - 1} AS DOUBLE) / ${(hi - lo).toDouble}) AS BIGINT)"
      s"((($norm >> $i) & 1) << ${i * n + ci})"
    }
    terms.mkString(" | ")
  }
}
