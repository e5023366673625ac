package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-reader init and file listing
    // for every table the catalog actually reads — not query work
    Seq("lineitem", "orders", "customer", "nation", "region",
      "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    // events carries TIMESTAMP(NANOS): warm it under a scoped
    // nanosAsLong window, then restore — the catalog's events helper
    // does its own scoped inference, so the benched queries must run
    // (and do run) in a conf-clean session
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").count()
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    // a crashing query must FAIL the bench visibly (nonzero exit + its
    // error in the JSON), never bench as a fast query — r1's x15 failure
    // was invisible here and caught only by the correctness oracle.
    // NonFatal only: an OOM or other VM error leaves the JVM unreliable,
    // so timings recorded after it would be meaningless — let it kill
    // the run instead of benchmarking through it.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case scala.util.control.NonFatal(e) =>
          Some(Option(e.toString).getOrElse(e.getClass.getName).take(300)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }.toSeq
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(e)) => k -> e }
    val errs = failed.map { case (k, e) => s"\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) {
      Console.err.println(s"BENCH FAILED: ${failed.map(_._1).mkString(", ")}")
      sys.exit(1)
    }
  }
}
