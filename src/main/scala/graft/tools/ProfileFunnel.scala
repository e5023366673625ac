package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling, Similarity}

/** Stage-level timing for the x31 curation funnel — where do its
  * seconds go at sf0.1? Usage: runMain graft.tools.ProfileFunnel [sfDir] */
object ProfileFunnel {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    val scored = docs
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
      .filter(col("quality") >= 0.3)
      .cache()
    time("scored cache+count")(scored.count())
    val pairs = time("subset nearDupPipeline count") {
      val p = Dedup.nearDupPipeline(scored, "doc_id", "text",
        minEstJaccard = 0.25, minJaccard = 0.4)
      p.count(); p
    }
    val clusters = time("resolveClusters (eager jobs)")(
      Dedup.resolveClusters(scored, "doc_id", pairs))
    val keepers = clusters.filter(col("keep")).select("doc_id")
    val sampled = Sampling.stratifiedSample(
      scored.join(keepers, Seq("doc_id")), "doc_id", "lang_pred",
      rates = Map("en" -> 0.8), defaultRate = 0.5)
    time("keepers join + sample count")(sampled.count())
    val qscale = Similarity.quantizeInt8(
        spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      .select(col("vec_id").as("doc_id"),
        TextFunctions.portableRound(col("scale"), 6).as("scale_r"))
    time("final join + orderBy + count")(
      sampled.join(qscale, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang_pred"), col("scale_r"))
        .orderBy("doc_id").count())
    scored.unpersist()
    spark.stop()
  }
}
