package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{MergeUpsert, Similarity, TableManifest}
import graft.streaming.StreamCuration

/** Long-running-stream soak for the curation maintenance cadence (r15
  * verdict task 1 done-bar): drive 100+ publish ticks through the real
  * curateBatch, with [[StreamCuration.maintainCurated]] on a
  * compactEvery cadence, and show that
  *   - the curated-base EPOCH COUNT stays bounded (≤ compactEvery, not
  *     O(ticks)),
  *   - the on-disk COW file backlog stays bounded (scoped vacuum
  *     reclaims superseded generations each maintenance tick),
  *   - [[StreamCuration.readCurated]] latency stays FLAT as ticks
  *     accumulate (its epoch-list metadata collect is the O(ticks)
  *     term maintenance retires).
  * A second, unmaintained run over the same slices is the control: its
  * epoch count and read latency grow with the tick count. Run:
  * `runMain graft.tools.CurateSoak [sfDir] [ticks] [compactEvery]`. */
object CurateSoak {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val ticks = if (args.length > 1) args(1).toInt else 120
    val cadence = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .localCheckpoint()
    docs.count()
    val quant = Similarity.quantizeInt8(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      .localCheckpoint()

    def baseFiles(work: String): Long = {
      val d = new java.io.File(StreamCuration.curatedBasePath(work))
      if (!d.exists()) 0L
      else {
        val walk = java.nio.file.Files.walk(d.toPath)
        try walk.filter(p => p.toString.endsWith(".parquet") &&
          !p.toString.contains("_manifest")).count()
        finally walk.close()
      }
    }
    def epochCount(work: String): Long = TableManifest
      .load(spark, StreamCuration.curatedBasePath(work))
      .map(_.select("part").distinct().count()).getOrElse(0L)

    def soak(label: String, maintainEvery: Int): Unit = {
      val work = java.nio.file.Files
        .createTempDirectory(s"graft-soak-$label").toString + "/cur"
      StreamCuration.publishQuantized(spark, work, quant)
      var readFirst = -1.0
      var readLast = -1.0
      (0 until ticks).foreach { k =>
        val t0 = System.nanoTime()
        StreamCuration.curateBatch(spark,
          docs.filter(docs("doc_id") % ticks === k), work,
          minQuality = 0.3, rates = Map("en" -> 0.8),
          defaultRate = 0.5, publish = true, epoch = k.toLong)
        val tickSec = (System.nanoTime() - t0) / 1e9
        var maintSec = 0.0
        if (maintainEvery > 0 && (k + 1) % maintainEvery == 0) {
          val m0 = System.nanoTime()
          StreamCuration.maintainCurated(spark, work)
          maintSec = (System.nanoTime() - m0) / 1e9
        }
        if ((k + 1) % 10 == 0 || k == ticks - 1) {
          val r0 = System.nanoTime()
          val rows = StreamCuration.readCurated(spark, work).count()
          val readSec = (System.nanoTime() - r0) / 1e9
          if (readFirst < 0) readFirst = readSec
          readLast = readSec
          println(f"[soak:$label] tick ${k + 1}%3d/$ticks " +
            f"tick=$tickSec%5.2fs maint=$maintSec%5.2fs " +
            f"read=$readSec%5.2fs rows=$rows%6d " +
            f"epochs=${epochCount(work)}%4d files=${baseFiles(work)}%5d")
        }
      }
      val dels = MergeUpsert.existingPlain(spark,
        StreamCuration.curatedDelsPath(work)).map(_.count()).getOrElse(0L)
      println(f"[soak:$label] FINAL epochs=${epochCount(work)} " +
        f"files=${baseFiles(work)} dels=$dels " +
        f"read_first=$readFirst%5.2fs read_last=$readLast%5.2fs")
    }

    soak("maintained", cadence)
    soak("control", 0)
    spark.stop()
  }
}
