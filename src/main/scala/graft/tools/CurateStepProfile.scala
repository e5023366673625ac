package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, IncrementalDedup, MergeUpsert, Similarity}
import graft.streaming.StreamCuration

object CurateStepProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-step shuffle telemetry (the Bench listener, step-scoped):
    // the verify stage's corpus-side read must STREAM under the
    // broadcast semi join — shuffle bytes there are candidate-sized,
    // never corpus-sized (r14 verdict item 8's done-bar)
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    def time[T](label: String)(f: => T): T = {
      org.apache.spark.graft.listenerBridge.drain(spark.sparkContext)
      shufRead.set(0); shufWrite.set(0)
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.listenerBridge.drain(spark.sparkContext)
      println(f"[step] $label%-30s $sec%7.2f s  " +
        f"shuffle r/w ${shufRead.get / 1e6}%.2f/${shufWrite.get / 1e6}%.2f MB")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val quant = Similarity.quantizeInt8(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      .localCheckpoint()
    (1 to 2).foreach { round =>
      println(s"[step] ---- round $round ----")
      val work = java.nio.file.Files
        .createTempDirectory("graft-curstep").toString + "/cur"
      StreamCuration.publishQuantized(spark, work, quant)
      (0 until 3).foreach { k =>
        val batch = docs.filter(col("doc_id") % 3 === k)
        graft.ScopedSessionConf.withShufflePartitions(spark, 4) {
          val scored0 = time(s"b$k score+sig+ckpt")(batch
            .withColumn("quality", TextFunctions.qualityScore(col("text")))
            .withColumn("lang_pred", TextFunctions.langId(col("text")))
            .filter(col("quality") >= 0.3)
            .withColumn("sig_", Dedup.minhashSigColumn(col("text"), 32))
            .localCheckpoint())
          val scored = scored0.drop("sig_")
          val batchSigs = scored0
            .select(col("doc_id").as("doc_id_"), col("sig_").as("sig"))
            .filter(size(col("sig")) > 0)
          val batchIds = scored.select(col("doc_id").as("doc_id_")).distinct()
          val prevSigs = MergeUpsert.existingPlain(spark,
            StreamCuration.sigsPath(work))
          val prevDocs = MergeUpsert.existingPlain(spark,
            StreamCuration.docsPath(work))
          time(s"b$k docs merge")(MergeUpsert.mergeWritePlain(spark,
            StreamCuration.docsPath(work), scored, Seq("doc_id")))
          time(s"b$k sigs merge")(MergeUpsert.mergeWritePlain(spark,
            StreamCuration.sigsPath(work), batchSigs, Seq("doc_id_")))
          val cands = time(s"b$k cands")(IncrementalDedup.candidatesVsPrev(
            prevSigs, batchSigs, batchIds, minEstJaccard = 0.25)
            .localCheckpoint())
          val candIds = cands.select(col("id_a").as("doc_id"))
            .unionByName(cands.select(col("id_b").as("doc_id"))).distinct()
          val batchInvolved = scored.select("doc_id", "text")
            .join(candIds, Seq("doc_id"), "left_semi")
          val involved = prevDocs match {
            case Some(prev) =>
              prev.select("doc_id", "text")
                .join(candIds, Seq("doc_id"), "left_semi")
                .join(scored.select("doc_id"), Seq("doc_id"), "left_anti")
                .unionByName(batchInvolved)
            case None => batchInvolved
          }
          val verified = time(s"b$k verify")(
            Dedup.verifyCandidates(involved, "doc_id", "text", cands,
              minJaccard = 0.4).localCheckpoint())
          time(s"b$k pairs merge")(
            MergeUpsert.mergeWritePlain(spark,
              StreamCuration.pairsPath(work), verified, Seq("id_a", "id_b")))
        }
      }
      // the pre-r15 O(corpus) publish, INLINED as the A/B baseline
      // (see CurationProfile; the real curateBatch now publishes
      // O(changed) deltas + a pointer flip instead)
      graft.ScopedSessionConf.withShufflePartitions(spark, 4) {
        time("final full rebuild (baseline)") {
          val allDocs = MergeUpsert.readPlain(spark,
            StreamCuration.docsPath(work))
          val pairs = MergeUpsert.readPlain(spark,
            StreamCuration.pairsPath(work))
          val keepers = Dedup.resolveClusters(allDocs, "doc_id", pairs)
            .filter(col("keep")).select("doc_id")
          val sampled = graft.operators.Sampling.stratifiedSample(
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
