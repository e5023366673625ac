package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.StreamCuration

object CurateNewProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    (1 to 3).foreach { round =>
      val work = java.nio.file.Files
        .createTempDirectory("graft-curnew").toString + "/cur"
      StreamCuration.publishQuantized(spark, work, quant)
      val t0 = System.nanoTime()
      (0 until 3).foreach { k =>
        StreamCuration.curateBatch(spark, docs.filter(col("doc_id") % 3 === k),
          work, minQuality = 0.3, rates = Map("en" -> 0.8),
          defaultRate = 0.5, publish = k == 2, shufflePartitions = 4)
      }
      val n = StreamCuration.readCurated(spark, work).count()
      println(f"[curnew] round $round total ${(System.nanoTime()-t0)/1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
