package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.StreamCuration

/** Per-tick cost curve of the REAL curateBatch as the corpus grows —
  * the r15 done-bar instrument: with the incremental publish (label
  * deltas + epoch merge + pointer flip), tick cost must track the
  * BATCH (constant here: every slice is ~|corpus|/N docs), not the
  * accumulated corpus. The pre-r15 design republished O(corpus) per
  * tick, so its curve grew with the prefix; flat ticks are the
  * O(changed-rows) signature. Each tick publishes (publishEvery = 1,
  * the worst case for the old design). Run:
  * `runMain graft.tools.CurateNewProfile [sfDir] [slices]`. */
object CurateNewProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val slices = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val quant = Similarity.quantizeInt8(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      .localCheckpoint()
    (1 to 2).foreach { round =>
      val work = java.nio.file.Files
        .createTempDirectory("graft-curnew").toString + "/cur"
      StreamCuration.publishQuantized(spark, work, quant)
      val total0 = System.nanoTime()
      (0 until slices).foreach { k =>
        val t0 = System.nanoTime()
        StreamCuration.curateBatch(spark,
          docs.filter(col("doc_id") % slices === k), work,
          minQuality = 0.3, rates = Map("en" -> 0.8),
          defaultRate = 0.5, publish = true, epoch = k.toLong)
        println(f"[curnew] round $round tick $k/$slices " +
          f"${(System.nanoTime() - t0) / 1e9}%6.2f s " +
          f"(corpus prefix ${k + 1}/$slices)")
      }
      val n = StreamCuration.readCurated(spark, work).count()
      println(f"[curnew] round $round total " +
        f"${(System.nanoTime() - total0) / 1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
