package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions

/** PCA (top principal component) with the distributed-Gramian +
  * driver-eigensolve split Spark MLlib's own PCA uses: the ONLY
  * data-scale pass builds the d×d scatter matrix (one map-side-combined
  * aggregation over n·d² products — n is the corpus, d² is 4096 at
  * d=64), and the eigen-iteration runs on those d² driver-resident
  * values (the bounded-collect pattern: FIXED size regardless of
  * corpus, same class as k-means centroids / MMR's pool matrix).
  *
  * Cross-engine determinism, the whole design:
  *   - vectors quantize to ×2^qBits integers, so the scatter matrix
  *     M = n·Σxxᵀ − (Σx)(Σxᵀ) is EXACT integer arithmetic (DECIMAL
  *     sums — no Int64 wrap at any corpus size) before one final cast
  *     to double;
  *   - every power-iteration fold (matrix·vector terms, the norm) runs
  *     in EXPLICIT ascending-index order — never aggregation order —
  *     and the vector is re-rounded to 1e-6 after each normalization
  *     (the x69 PageRank discipline), so an oracle replaying the same
  *     folds gets bit-identical doubles;
  *   - the iteration count is a parameter, not a convergence test:
  *     fixed work, fixed answer.
  *
  * What the top component buys a training-data pipeline: the dominant
  * variance axis of an embedding corpus — mean-centered projection for
  * whitening, drift dashboards (compare components across snapshots),
  * and the all-ones-direction check that catches un-normalized
  * embedding batches. */
object Pca {

  private val dec = DecimalType(38, 0)

  /** Exact integer scatter matrix over quantized vectors:
    * (i, j, m) with m = n·Σ xq_i·xq_j − (Σxq_i)·(Σxq_j) as
    * DECIMAL(38,0) — n²·cov, which shares eigenvectors with cov.
    *
    * Exactness vs throughput: the product sums must NEVER wrap, but a
    * DECIMAL(38) accumulator over the n·d² products costs ~8× a long
    * sum (measured at sf1: 2.3 s → 19 s). The accumulator width is
    * therefore DECIDED from a measured bound — n and max|xq| come
    * from one scalar pass, and the long path runs only when
    * n·max² ≤ 2⁶² provably holds (≈8e9 rows at qBits=10 embedding
    * magnitudes); past that, per-element decimal casts engage. Both
    * paths are exact, so the values are identical to each other and
    * to the oracle's HUGEINT sums on either side of the cutover.
    * `forceDecimalAt` lets the spec pin the wide path's parity
    * without materializing 8e9 rows (n ≥ forceDecimalAt ⇒ decimal). */
  def scatterMatrix(corpus: DataFrame, vecCol: String,
                    qBits: Int = 10,
                    forceDecimalAt: Long = Long.MaxValue): DataFrame = {
    val scale = (1L << qBits).toDouble
    val xq = corpus.select(
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(scale) + lit(0.5)).cast("long"))
        .as("xq"))
      // null/empty vectors posexplode to nothing — keep n consistent
      // with the rows that actually contribute products
      .filter(col("xq").isNotNull && size(col("xq")) > 0)
    val head = xq.agg(count(lit(1)),
      max(aggregate(col("xq"), lit(0L),
        (acc, x) => greatest(acc, abs(x))))).head()
    val n = head.getLong(0)
    val maxq = if (head.isNullAt(1)) 0L else head.getLong(1)
    val longSafe = n < forceDecimalAt &&
      maxq < 3037000499L && // maxq² itself must fit Int64
      (maxq == 0L || n <= (Long.MaxValue / 2) / (maxq * maxq))
    // one hash agg over n·d² products — map-side combined, the shuffle
    // carries only d² rows per partition
    val sums =
      if (longSafe)
        expl2(xq).groupBy("i", "j")
          .agg(sum(col("xi") * col("xj")).cast(dec).as("s"))
      else
        expl2(xq).groupBy("i", "j")
          .agg(sum((col("xi") * col("xj")).cast(dec)).as("s"))
    val tots =
      if (longSafe)
        expl1(xq).groupBy("i").agg(sum(col("xi")).cast(dec).as("t"))
      else
        expl1(xq).groupBy("i").agg(sum(col("xi").cast(dec)).as("t"))
    sums
      .join(tots.select(col("i").as("_ti"), col("t").as("ti")),
        col("i") === col("_ti"))
      .join(tots.select(col("i").as("_tj"), col("t").as("tj")),
        col("j") === col("_tj"))
      .select(col("i"), col("j"),
        (lit(n).cast(dec) * col("s") - col("ti") * col("tj")).as("m"))
  }

  private def expl1(xq: DataFrame): DataFrame =
    xq.select(col("xq"), posexplode(col("xq")).as(Seq("i", "xi")))

  private def expl2(xq: DataFrame): DataFrame =
    expl1(xq).select(col("i"), col("xi"),
      posexplode(col("xq")).as(Seq("j", "xj")))

  /** Top principal component by `iters` power-iteration rounds on the
    * collected scatter matrix. Returns (pos, loading) with loadings
    * rounded to 1e-6 — the exact values an oracle replaying the same
    * ordered folds produces. */
  def topComponent(corpus: DataFrame, vecCol: String, qBits: Int = 10,
                   iters: Int = 6): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // d² values — bounded driver data (4096 doubles at d=64)
    val m = scatterMatrix(corpus, vecCol, qBits).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        r.getDecimal(2).doubleValue()))
      .toMap
    require(m.nonEmpty, "pca: empty corpus")
    val d = m.keys.map(_._1).max + 1
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to iters) {
      // matrix·vector with the fold in ascending-j order per row;
      // ragged corpora can leave (i, j) holes — a missing cell is a
      // zero scatter entry, not a crash
      val w = Array.tabulate(d) { i =>
        (0 until d).foldLeft(0.0)((acc, j) =>
          acc + m.getOrElse((i, j), 0.0) * v(j))
      }
      // norm folded in ascending-i order; a zero matrix (constant
      // corpus) has no preferred direction — keep v rather than
      // dividing by zero into NaN loadings
      val norm = math.sqrt(w.foldLeft(0.0)((acc, x) => acc + x * x))
      if (norm > 0.0)
        v = w.map(x => TextFunctions.portableRoundJvm(x / norm, 6))
    }
    v.zipWithIndex.map { case (x, i) => (i, x) }.toSeq
      .toDF("pos", "loading")
  }
}
