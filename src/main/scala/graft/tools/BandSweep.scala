package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Band-layout sweep for the MinHash LSH candidate generator, run
  * through the sampled-truth recall harness ([[Dedup.lshRecall]],
  * sampleMod = 4) on a scaled corpus: for each (bands, rowsPerBand)
  * the harness reports measured recall against exact sampled truth and
  * the candidate volume the layout pays for it — the two axes of the
  * S-curve trade (more bands → higher recall, more candidates; more
  * rows per band → sharper threshold, fewer low-similarity
  * candidates). The default 8×4 layout should sit on the measured
  * Pareto front; PERF.md records the sweep. */
object BandSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-band-sweep").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm listing + page cache out of the timed region
    // bands × rowsPerBand ≤ 64: MinhashSig's overflow-free ceiling
    val grid = Seq(4 -> 2, 4 -> 4, 8 -> 2, 8 -> 4, 8 -> 8,
      16 -> 2, 16 -> 4, 32 -> 2)
    println("| bands | rows/band | hashes | n_truth | n_cand | n_hit | recall | sec |")
    println("|---|---|---|---|---|---|---|---|")
    grid.foreach { case (b, r) =>
      val t0 = System.nanoTime()
      val row = Dedup.lshRecall(docs, "doc_id", "text", "lang",
        bands = b, rowsPerBand = r, sampleMod = 4).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = if (row.isNullAt(3)) "NULL" else f"${row.getDouble(3)}%.4f"
      println(f"| $b | $r | ${b * r} | ${row.getLong(0)} | ${row.getLong(1)} | ${row.getLong(2)} | $recall | $sec%.1f |")
    }
    spark.stop()
  }
}
