package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.functions.TextFunctions
import graft.operators.{Dedup, IncrementalDedup, MergeUpsert, Sampling, Similarity}

/** Event-triggered CURATION — the reference's S3 → Lambda → ETL shape
  * (aws/lambda_handler.py:7-52) applied to the training-data surface:
  * document files arrive, and each micro-batch incrementally extends
  * the curated corpus instead of re-running the batch CurationJob from
  * scratch.
  *
  * Per micro-batch (foreachBatch):
  *   1. quality gate + language ID — codegen'd scan of the NEW docs only;
  *   2. docs-store merge (keyed upsert; idempotent under redelivery);
  *   3. [[IncrementalDedup.appendBatch]] — minhash vs the signature
  *      store, candidates batch-vs-corpus only;
  *   4. exact n-gram verify of those candidates, text served by the
  *      docs store (the join prunes to the candidates' ids);
  *   5. verified-pairs merge (keyed on the pair);
  *   6. republish curated: cluster resolution over ACCUMULATED pairs →
  *      keepers → stratified sample → pre-quantized embeddings joined →
  *      [[MergeUpsert.publishPlain]] (atomic version flip — the row set
  *      can shrink when an arriving doc displaces a kept near-dup, so
  *      this is a publish, not an upsert).
  *
  * Convergence: steps 1–5 accumulate exactly the quality-filtered docs
  * and verified pairs a batch CurationJob run over the union corpus
  * would compute (the x38 invariant for candidates; the verify filter
  * is per-pair so it commutes with accumulation). Step 6's cluster
  * resolution, sampling and embedding join are deterministic functions
  * of that state — so after any prefix of batches, the curated table
  * EQUALS the batch pipeline's output on the documents seen so far,
  * and a checkpoint restart resumes mid-stream to the same fixpoint
  * (StreamCurationSpec proves both).
  *
  * Contract: doc_id is content-stable — redelivery means the same
  * bytes (the at-least-once file-source model; every store here is
  * idempotent under it). A MUTATED document under a reused id would
  * overwrite its doc/signature rows but leave previously verified
  * pairs computed from the old text standing; corrections need a new
  * doc_id (append-only corpus semantics, the norm for training data).
  *
  * Scale notes: per-batch text work is O(batch) (the whole point);
  * cluster resolution re-runs over the accumulated pair set but pairs
  * are SPARSE (verified near-dups) and label propagation touches ids,
  * not text. The curated republish rewrites the output table, so it
  * runs on a `publishEvery`-batch cadence (the `compactEvery` pattern
  * from [[StreamIngest]]): steps 1-5 accumulate every batch, step 6
  * fires every Nth data batch — retention already decouples readers
  * from cadence, and the stores themselves never rewrite history.
  * Because the publish is a deterministic function of the accumulated
  * stores, an AvailableNow drain finishes with one convergence
  * republish, so the final table is cadence-independent (and a
  * checkpoint restart mid-cadence resumes the batch counter — proven
  * by StreamCurationSpec). Embeddings are int8-quantized ONCE at
  * stream start, not per batch. */
object StreamCuration {

  /** Paths inside a curation work dir. */
  def docsPath(work: String) = s"$work/docs"
  def sigsPath(work: String) = s"$work/sigs"
  def pairsPath(work: String) = s"$work/pairs"
  def curatedPath(work: String) = s"$work/curated"
  private def embPath(work: String) = s"$work/emb_q"

  /** Drain all currently-available document files, curating
    * incrementally; blocking. `publishEvery` = republish the curated
    * table every N data batches (1 = every batch). A drain whose last
    * batch falls mid-cadence would leave `curated` at the previous
    * publish tick, so the drain always ends with one convergence
    * republish — idempotent when the last batch already published —
    * making the final table independent of the cadence. */
  def curateAvailableNow(spark: SparkSession, srcGlob: String,
                         schema: StructType, workDir: String,
                         embeddingsPath: String, checkpoint: String,
                         minQuality: Double = 0.3,
                         rates: Map[String, Double] = Map("en" -> 0.8),
                         defaultRate: Double = 0.5,
                         publishEvery: Int = 1): Unit = {
    start(spark, srcGlob, schema, workDir, embeddingsPath, checkpoint,
      minQuality, rates, defaultRate, Trigger.AvailableNow(), publishEvery)
      .awaitTermination()
    // guard: a zero-data drain has no stores to publish from
    val docsDir = new org.apache.hadoop.fs.Path(docsPath(workDir))
    if (publishEvery > 1 &&
        docsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(docsDir))
      republishCurated(spark, workDir, rates, defaultRate)
  }

  /** Continuous curation on a ProcessingTime cadence; non-blocking.
    * With `publishEvery` > 1 the curated table trails the stores by up
    * to N-1 batches between ticks (the production trade: publish cost
    * amortizes over N batches of accumulation). */
  def curateContinuous(spark: SparkSession, srcGlob: String,
                       schema: StructType, workDir: String,
                       embeddingsPath: String, checkpoint: String,
                       minQuality: Double = 0.3,
                       rates: Map[String, Double] = Map("en" -> 0.8),
                       defaultRate: Double = 0.5,
                       interval: String = "1 second",
                       publishEvery: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery =
    start(spark, srcGlob, schema, workDir, embeddingsPath, checkpoint,
      minQuality, rates, defaultRate, Trigger.ProcessingTime(interval),
      publishEvery)

  /** The live curated corpus (readers see atomic version flips). */
  def readCurated(spark: SparkSession, workDir: String): DataFrame =
    MergeUpsert.readPlain(spark, curatedPath(workDir))

  private def start(spark: SparkSession, srcGlob: String,
                    schema: StructType, workDir: String,
                    embeddingsPath: String, checkpoint: String,
                    minQuality: Double, rates: Map[String, Double],
                    defaultRate: Double, trigger: Trigger,
                    publishEvery: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(publishEvery >= 1, s"publishEvery must be >= 1: $publishEvery")
    publishQuantizedEmbeddings(spark, workDir, embeddingsPath)
    spark.readStream.schema(schema).parquet(srcGlob)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // cadence counts DATA batches by checkpointed batchId, so a
        // restart mid-cadence resumes the same publish schedule
        curateBatch(batch.sparkSession, batch, workDir, minQuality,
          rates, defaultRate,
          publish = (batchId + 1) % publishEvery == 0)
      }
      .start()
  }

  /** Quantize the embedding table once into the work dir (idempotent
    * republish — deterministic output, and a restart mid-write is
    * healed by the version protocol). Called by [[start]]; exposed so
    * batch/catalog callers preparing a work dir for [[curateBatch]]
    * share the exact layout instead of duplicating it. */
  def publishQuantizedEmbeddings(spark: SparkSession, workDir: String,
                                 embeddingsPath: String): Unit =
    publishQuantized(spark, workDir,
      Similarity.quantizeInt8(
        spark.read.parquet(embeddingsPath), "vec_id", "embedding"))

  /** Same publish from an already-quantized (vec_id, scale, codes)
    * frame — callers that share one quantization across several work
    * dirs (a session running many streams over the same embeddings
    * table) pay the quantization pass once and re-publish bytes. */
  def publishQuantized(spark: SparkSession, workDir: String,
                       quantized: DataFrame): Unit =
    MergeUpsert.publishPlain(spark, embPath(workDir),
      quantized
        .select(col("vec_id").as("doc_id"), col("scale"), col("codes")))

  /** One incremental curation step — also the backfill entry point
    * (batch callers can feed historical chunks through the same code
    * the stream runs). `publish = false` accumulates the stores only
    * (steps 1-5); a later [[republishCurated]] — or any subsequent
    * publishing batch — converges the curated table, because the
    * publish is a deterministic function of the accumulated state. */
  def curateBatch(spark: SparkSession, batch: DataFrame, workDir: String,
                  minQuality: Double, rates: Map[String, Double],
                  defaultRate: Double, publish: Boolean = true,
                  shufflePartitions: Int = 8): Unit = {
    // Scoped shuffle sizing (the StreamJoin/StreamDedup lesson, batch
    // face): a micro-batch is SMALL by construction, but its ~10
    // shuffles (store merges, candidate join, verify, publish) would
    // otherwise run at the session's batch-sized partition count —
    // measured 26% of the 3-batch drain at 32 partitions. The shared
    // ScopedSessionConf lock makes the set/restore window sound even if
    // batches ever stop being serial. 0 = inherit the session conf.
    graft.ScopedSessionConf.withShufflePartitions(spark, shufflePartitions) {
      curateBatchInner(spark, batch, workDir, minQuality, rates,
        defaultRate, publish)
    }
  }

  private def curateBatchInner(spark: SparkSession, batch: DataFrame,
                               workDir: String, minQuality: Double,
                               rates: Map[String, Double],
                               defaultRate: Double,
                               publish: Boolean): Unit = {
    // localCheckpoint (eager): scored feeds the docs-store merge AND
    // the signature append — without it each action re-reads and
    // re-scores the batch text
    val scored = batch
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
      .filter(col("quality") >= minQuality)
      .localCheckpoint()
    // docs store first: the verify join needs BOTH pair sides' text,
    // and a candidate's corpus-side doc lives only here
    MergeUpsert.mergeWritePlain(spark, docsPath(workDir), scored,
      Seq("doc_id"))
    // candidates materialized (they are consumed twice below, and the
    // documented appendBatch contract wants them consumed before the
    // store version window moves anyway)
    val cands = IncrementalDedup.appendBatch(spark, sigsPath(workDir),
      scored, "doc_id", "text", minEstJaccard = 0.25)
      .localCheckpoint()
    val allDocs = MergeUpsert.readPlain(spark, docsPath(workDir))
    // verify touches only the docs the candidates involve — O(batch
    // candidates), NOT a per-batch n-gram pass over the whole corpus
    val involved = allDocs.join(
      cands.select(col("id_a").as("doc_id"))
        .unionByName(cands.select(col("id_b").as("doc_id"))).distinct(),
      Seq("doc_id"), "left_semi")
    val verified = Dedup.verifyCandidates(involved, "doc_id", "text",
      cands, minJaccard = 0.4)
    MergeUpsert.mergeWritePlain(spark, pairsPath(workDir), verified,
      Seq("id_a", "id_b"))
    if (publish) republishCurated(spark, workDir, rates, defaultRate)
  }

  /** Step 6 alone: rebuild + atomically republish the curated table
    * from the accumulated stores (ids + sparse pairs — no text re-scan
    * beyond the output write itself). Deterministic in the store state,
    * so calling it twice, or after a crash/restart anywhere in the
    * cadence, converges to the same table. */
  def republishCurated(spark: SparkSession, workDir: String,
                       rates: Map[String, Double],
                       defaultRate: Double): Unit = {
    val allDocs = MergeUpsert.readPlain(spark, docsPath(workDir))
    val pairs = MergeUpsert.readPlain(spark, pairsPath(workDir))
    val keepers = Dedup.resolveClusters(allDocs, "doc_id", pairs)
      .filter(col("keep")).select("doc_id")
    val sampled = Sampling.stratifiedSample(
      allDocs.join(keepers, Seq("doc_id")), "doc_id", "lang_pred",
      rates, defaultRate)
    val curated = sampled.join(
      MergeUpsert.readPlain(spark, embPath(workDir)), Seq("doc_id"), "left")
    MergeUpsert.publishPlain(spark, curatedPath(workDir), curated)
  }
}
