package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, IncrementalDedup, MergeUpsert, Sampling,
  Similarity}
import graft.streaming.StreamCuration

/** Phase-level timing of the r13 SERIAL curation replay — kept as the
  * A/B baseline for the r14 overlapped/adaptive-width path (this file
  * mirrors the pre-r14 curateBatchInner step order; CurateStepProfile
  * mirrors the CURRENT structure, CurateNewProfile times the real
  * curateBatch end to end). Run:
  * `runMain graft.tools.CurationProfile [sfDir]`. */
object CurationProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cur] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val quant = Similarity.quantizeInt8(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      .localCheckpoint()

    (1 to 2).foreach { round =>
      println(s"[cur] ---- round $round ----")
      val work = java.nio.file.Files
        .createTempDirectory("graft-curprof").toString + "/cur"
      time("publish quantized emb")(
        StreamCuration.publishQuantized(spark, work, quant))
      (0 until 3).foreach { k =>
        val batch = docs.filter(col("doc_id") % 3 === k)
        graft.ScopedSessionConf.withShufflePartitions(spark, 4) {
          val scored = time(s"b$k score+checkpoint")(batch
            .withColumn("quality", TextFunctions.qualityScore(col("text")))
            .withColumn("lang_pred", TextFunctions.langId(col("text")))
            .filter(col("quality") >= 0.3)
            .localCheckpoint())
          time(s"b$k docs-store merge")(
            MergeUpsert.mergeWritePlain(spark,
              StreamCuration.docsPath(work), scored, Seq("doc_id")))
          val cands = time(s"b$k sig append+cands")(
            IncrementalDedup.appendBatch(spark,
              StreamCuration.sigsPath(work), scored, "doc_id", "text",
              minEstJaccard = 0.25).localCheckpoint())
          val allDocs = MergeUpsert.readPlain(spark,
            StreamCuration.docsPath(work))
          val involved = allDocs.join(
            cands.select(col("id_a").as("doc_id"))
              .unionByName(cands.select(col("id_b").as("doc_id"))).distinct(),
            Seq("doc_id"), "left_semi")
          val verified = time(s"b$k verify")(
            Dedup.verifyCandidates(involved, "doc_id", "text", cands,
              minJaccard = 0.4))
          time(s"b$k pairs merge")(
            MergeUpsert.mergeWritePlain(spark,
              StreamCuration.pairsPath(work), verified, Seq("id_a", "id_b")))
        }
      }
      // the pre-r15 O(corpus) publish, INLINED: cluster re-resolution
      // over all accumulated pairs, full re-sample, full embedding
      // join, whole-table rewrite — the baseline the r15 incremental
      // publish (O(changed) deltas + pointer flip) is measured against
      graft.ScopedSessionConf.withShufflePartitions(spark, 4) {
        time("final full rebuild (baseline)") {
          val allDocs = MergeUpsert.readPlain(spark,
            StreamCuration.docsPath(work))
          val pairs = MergeUpsert.readPlain(spark,
            StreamCuration.pairsPath(work))
          val keepers = Dedup.resolveClusters(allDocs, "doc_id", pairs)
            .filter(col("keep")).select("doc_id")
          val sampled = Sampling.stratifiedSample(
            allDocs.join(keepers, Seq("doc_id")), "doc_id", "lang_pred",
            Map("en" -> 0.8), 0.5)
          sampled.join(quant.select(col("vec_id").as("doc_id"),
              col("scale"), col("codes")), Seq("doc_id"), "left")
            .write.mode("overwrite").parquet(s"$work/curated_baseline")
        }
      }
      time("read curated")(
        spark.read.parquet(s"$work/curated_baseline").count())
    }
    spark.stop()
  }
}
