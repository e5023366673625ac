package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamCuration

/** Stage-level timing for the x39 incremental-curation replay — where
  * do its seconds go, and which stages repeat work across invocations
  * in one session? Runs the full replay twice (fresh work dir each
  * time, exactly the catalog shape) and prints per-stage seconds plus
  * the session codegen-compile counter per stage.
  *
  * Round-8 findings this tool produced: warm invocations decompose
  * into ~22 fixed-latency local Spark jobs (store merges ×6, sig
  * appends ×3, scoring checkpoints ×3, publish ~4, quantize publish,
  * reads) at ~0.25–0.35 s each on local[32]; janino compiles converge
  * to ~0 by the third batch; removing the two per-batch
  * localCheckpoints or dropping shuffle partitions 8→4 moves totals
  * by less than run-to-run host noise. The replay floor is job-count
  * latency, not data motion — at production micro-batch sizes the
  * same 22 jobs carry GB-scale batches and the floor amortizes away.
  * Usage: runMain graft.tools.ProfileCuration [sfDir] */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def compiles(): Long = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    def time[T](label: String)(f: => T): T = {
      val (t0, c0) = (System.nanoTime(), compiles())
      val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  compiles=${compiles() - c0}%3d")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    (1 to 2).foreach { round =>
      println(s"== invocation $round")
      val work = java.nio.file.Files
        .createTempDirectory("graft-profcur").toString + "/cur"
      time("publishQuantizedEmbeddings")(
        StreamCuration.publishQuantizedEmbeddings(spark, work,
          s"$dir/embeddings.parquet"))
      (0 until 3).foreach { k =>
        time(s"curateBatch $k (publish=${k == 2})")(
          StreamCuration.curateBatch(spark,
            docs.filter(col("doc_id") % 3 === k), work,
            minQuality = 0.3, rates = Map("en" -> 0.8),
            defaultRate = 0.5, publish = k == 2, shufflePartitions = 4,
            epoch = k.toLong))
      }
      time("readCurated count")(
        StreamCuration.readCurated(spark, work).count())
    }
    spark.stop()
  }
}
