package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{IngestJob, Lineage, MetricsJob, QueryLayer}

/** End-to-end demo/driver of the full reference-parity pipeline on a
  * throwaway workspace: ingest CSV → rejects → dims → capacity merge →
  * metrics → every endpoint query → CSV export. Usage:
  *
  *   sbt "runMain graft.tools.Demo [csvPath] [workDir]"
  *
  * With no args it writes the reference's sample rows (remapped to the
  * HHS contract headers) to a temp dir first.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val work = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-demo").toString
    val csv = if (args.nonEmpty) args(0) else {
      val p = s"$work/input.csv"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        """date,state,inpatient_beds,inpatient_beds_used,total_staffed_adult_icu_beds,staffed_adult_icu_bed_occupancy
          |2024-01-15,California,50000,42000,5000,4800
          |2024-01-15,Texas,45000,38000,4500,4200
          |2024-01-16,California,50000,43000,5000,4900
          |2024-01-16,Texas,45000,39000,4500,4300
          |2024-01-17,New York,40000,50000,4000,3800
          |""".stripMargin)
      p
    }
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val now = java.sql.Timestamp.valueOf("2024-01-18 00:00:00")
    println(s"== workdir: $work")
    val res = IngestJob.run(spark, csv, s"$work/capacity", s"$work/regions",
      s"$work/rejects", s"$work/runs", runId = "demo-run-1",
      source = "demo_csv", now = now)
    println(s"== ingest: in=${res.rowsIn} loaded=${res.rowsLoaded} rejected=${res.rowsRejected}")

    MetricsJob.run(spark, s"$work/capacity", s"$work/metrics",
      s"$work/runs", "demo-run-2", now)

    // manifest-aware reads: against a REUSED workDir the second run's
    // merges are copy-on-write rewrites, so a plain spark.read.parquet
    // would see both generations of every rewritten partition (double
    // counts); readOrPlain plans from the manifest when one exists and
    // falls back to the plain scan on a fresh workdir
    val metrics = graft.operators.TableManifest
      .readOrPlain(spark, s"$work/metrics")
    val regions = spark.read.parquet(s"$work/regions")

    println("== latest date:")
    QueryLayer.latestDate(metrics).show()
    val latest = QueryLayer.latestDate(metrics).head().getDate(0)

    println("== /metrics/latest:")
    // manifest-planned endpoint twin: the request's date partitions are
    // resolved from the table's _manifest (zero directory listing)
    QueryLayer.metricsLatestAt(spark, s"$work/metrics", regions,
      new java.sql.Date(latest.getTime)).show(false)

    println("== /metrics/compare (2024-01-16):")
    val compared = QueryLayer.metricsCompareAt(spark, s"$work/metrics",
      regions, java.sql.Date.valueOf("2024-01-16"))
    compared.show(false)

    println("== dashboard KPIs:")
    QueryLayer.dashboardKpis(compared).show(false)

    println("== dashboard table (banded):")
    QueryLayer.dashboardTable(compared).show(false)

    println("== available dates / coverage (min_rows=2):")
    QueryLayer.availableDates(metrics).show()
    QueryLayer.coverage(metrics, minRows = 2).show()
    QueryLayer.bestCoverage(metrics, minRows = 2).show()

    println("== runs lineage:")
    QueryLayer.recentRuns(Lineage.read(spark, s"$work/runs")).show(false)

    QueryLayer.exportCsv(compared, s"$work/export")
    println(s"== csv export:")
    scala.io.Source.fromFile(
      new java.io.File(s"$work/export").listFiles()
        .filter(_.getName.endsWith(".csv")).head)
      .getLines().foreach(println)

    println("== json envelope:")
    QueryLayer.jsonEnvelope(compared).show(false)

    spark.stop()
  }
}
