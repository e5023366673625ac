package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.TableManifest

/** Phase-level timing of the COW housekeeping rows (x240's shape) —
  * the dev harness behind the r13 fixed-cost work. Not part of the
  * catalog; run: `runMain graft.tools.CowProfile [sfDir]`. */
object CowProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cow] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm the session like Bench does
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    graft.queries.ReferenceCatalog.events(spark, dir).count()

    (1 to 2).foreach { round =>
      println(s"[cow] ---- round $round ----")
      val work = java.nio.file.Files
        .createTempDirectory("graft-cowprof").toString
      val path = s"$work/events_table"
      val ev = graft.queries.ReferenceCatalog.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          TextFunctions.portableRound(col("value"), 4).as("value"),
          to_date(col("ts")).cast("string").as("date"))
      time("merge 1 (bootstrap)")(
        TableManifest.mergeWriteManifested(spark, path, ev,
          keys = Seq("event_id")))
      time("merge 2 (1/7 keys)")(
        TableManifest.mergeWriteManifested(spark, path,
          ev.filter(col("event_id") % 7 === 0), keys = Seq("event_id")))
      time("merge 3 (1/5 keys)")(
        TableManifest.mergeWriteManifested(spark, path,
          ev.filter(col("event_id") % 5 === 0), keys = Seq("event_id")))
      val vac = time("vacuum 1 (reclaims)")(
        TableManifest.vacuum(spark, path, keepVersions = 2))
      println(s"[cow]   $vac")
      time("vacuum 2 (idempotent)")(
        TableManifest.vacuum(spark, path, keepVersions = 2))
      time("lookup")(
        TableManifest.lookup(spark, path, "event_id", 100L, 200L)
          ._1.count())

      // decomposition: the same merges WITHOUT manifest maintenance
      // (plain cow mergeWrite) — the delta is the manifest's overhead
      val bare = s"$work/bare_table"
      time("bare merge 1 (bootstrap)")(
        graft.operators.MergeUpsert.mergeWrite(spark, bare, ev,
          Seq("event_id"), cow = true))
      time("bare merge 2 (1/7 keys)")(
        graft.operators.MergeUpsert.mergeWrite(spark, bare,
          ev.filter(col("event_id") % 7 === 0), Seq("event_id"),
          cow = true))
      time("batchStats alone")(
        graft.operators.MergeUpsert.batchStats(
          ev.filter(col("event_id") % 5 === 0), Seq("event_id"), "date"))
    }
    spark.stop()
  }
}
