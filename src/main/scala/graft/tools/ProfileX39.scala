package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.StreamCuration

/** Phase-level profile of the EXACT x39 catalog shape (3 curateBatch
  * calls, publish on the cadence tick, readCurated) with per-phase
  * wall / Spark-job-count / codegen-compile attribution — the r16
  * instrument for the warm plan-churn bar: after the codegen-cache fix
  * the warm reps compile ZERO classes, so what remains is per-JOB
  * latency; this shows which phase pays it. Two rounds; read round 2
  * (warm). `runMain graft.tools.ProfileX39 [sfDir]`. */
object ProfileX39 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val verbose = sys.env.contains("X39_JOBS")
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (verbose) {
            val site = Option(j.properties)
              .map(_.getProperty("callSite.short", "?")).getOrElse("?")
            jobStartNs.put(j.jobId, (System.nanoTime(), site))
          }
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (verbose) {
            val v = jobStartNs.remove(e.jobId)
            if (v != null) {
              val ms = (System.nanoTime() - v._1) / 1e6
              println(f"[x39job]   job ${e.jobId}%3d ${ms}%7.1f ms  ${v._2}")
            }
          }
      })
    def compiles(): Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    def time[T](label: String)(f: => T): T = {
      org.apache.spark.graft.listenerBridge.drain(spark.sparkContext)
      jobs.set(0); val c0 = compiles()
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.listenerBridge.drain(spark.sparkContext)
      println(f"[x39] $label%-28s $sec%6.2f s  jobs=${jobs.get()}%3d " +
        f"compiles=${compiles() - c0}%4d")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val quant = Similarity.quantizeInt8(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      .localCheckpoint()
    (1 to 2).foreach { round =>
      println(s"[x39] ---- round $round ----")
      val work = java.nio.file.Files
        .createTempDirectory("graft-px39").toString + "/cur"
      time("publishQuantized")(
        StreamCuration.publishQuantized(spark, work, quant))
      (0 until 3).foreach { k =>
        time(s"batch $k publish=${k == 2}")(
          StreamCuration.curateBatch(spark,
            docs.filter(col("doc_id") % 3 === k), work,
            minQuality = 0.3, rates = Map("en" -> 0.8),
            defaultRate = 0.5, publish = k == 2, shufflePartitions = 4,
            epoch = k.toLong))
      }
      time("readCurated+count")(
        StreamCuration.readCurated(spark, work).count())
    }
    spark.stop()
  }
}
