package graft.tools
import org.apache.spark.sql.SparkSession

/** Isolate q06_band_counts cost: run q05/q06/q07 cold then warm with
  * per-run timing, print q06's formatted plan. */
object ProfileQ06 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    spark.read.parquet(s"$dir/orders.parquet").count()
    val qs = graft.SparkEntry.queries
    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      qs(name)(spark, dir).count()
      println(f"[q06prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    Seq("q05_strain_band", "q06_band_counts", "q07_filter_latest_date")
      .foreach(time)
    println("[q06prof] --- warm repeat ---")
    Seq("q05_strain_band", "q06_band_counts", "q07_filter_latest_date")
      .foreach(time)
    qs("q06_band_counts")(spark, dir).explain("formatted")
    spark.stop()
  }
}
