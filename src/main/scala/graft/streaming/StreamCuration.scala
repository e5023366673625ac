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
  *   1. quality gate + language ID — codegen'd scan of the NEW docs
  *      only — and ONE minhash pass over the batch text;
  *   2. three independent jobs OVERLAPPED (r14: serially they stack
  *      ~1 s/batch of pure store round-trip latency): the docs-store
  *      merge (keyed upsert; idempotent under redelivery), the
  *      signature-store merge, and
  *      [[IncrementalDedup.candidatesVsPrev]] — minhash candidates
  *      batch-vs-corpus only, against prev ∪ batch signatures
  *      (row-identical to the version the merge publishes);
  *   3. exact n-gram verify of those candidates, text served by the
  *      docs store (the join prunes to the candidates' ids);
  *   4. verified-pairs merge (keyed on the pair);
  *   5. republish curated: cluster resolution over ACCUMULATED pairs →
  *      keepers → stratified sample → pre-quantized embeddings joined →
  *      [[MergeUpsert.publishPlain]] (atomic version flip — the row set
  *      can shrink when an arriving doc displaces a kept near-dup, so
  *      this is a publish, not an upsert).
  *
  * Convergence: steps 1–4 accumulate exactly the quality-filtered docs
  * and verified pairs a batch CurationJob run over the union corpus
  * would compute (the x38 invariant for candidates; the verify filter
  * is per-pair so it commutes with accumulation). Step 5's cluster
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
  * from [[StreamIngest]]): steps 1-4 accumulate every batch, step 5
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
    // One column-pruned pre-count sizes the batch's COMPUTE WIDTH: a
    // true micro-batch (the design cadence) runs the narrow path —
    // small scoped shuffles, no repartitions, latency-optimal. A
    // backfill/replay-scale batch (≥ ~2k docs per core) additionally
    // repartitions its two compute-heavy text scans (scoring+minhash,
    // n-gram verify) to machine width: such a batch often arrives as
    // ONE parquet file = one task, which serialized 3+ s/batch of
    // minhash on a single core in the sf1 replay while 31 cores idled.
    val cores = spark.sparkContext.defaultParallelism
    val width =
      if (batch.count() >= 2048L * cores) cores else 0
    // Scoped shuffle sizing (the StreamJoin/StreamDedup lesson, batch
    // face): a micro-batch is SMALL by construction, but its ~10
    // shuffles (store merges, candidate join, verify, publish) would
    // otherwise run at the session's batch-sized partition count —
    // measured 26% of the 3-batch drain at 32 partitions. The shared
    // ScopedSessionConf lock makes the set/restore window sound even if
    // batches ever stop being serial. 0 = inherit the session conf.
    graft.ScopedSessionConf.withShufflePartitions(spark, shufflePartitions) {
      curateBatchInner(spark, batch, workDir, minQuality, rates,
        defaultRate, publish, width)
    }
  }

  private def curateBatchInner(spark: SparkSession, batch: DataFrame,
                               workDir: String, minQuality: Double,
                               rates: Map[String, Double],
                               defaultRate: Double,
                               publish: Boolean,
                               width: Int): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // localCheckpoint (eager): scored feeds the docs-store merge AND
    // the signature work — without it each action re-reads and
    // re-scores the batch text. The minhash signatures ride the SAME
    // scan (quality, language and sigs in one checkpointed pass; a
    // separate minhashSignatures pass was a second full read+
    // materialize of the batch text, ~0.3 s/batch of pure repetition)
    // A replay-scale batch (width > 0, sized by curateBatch's
    // pre-count) is repartitioned to compute width FIRST: its
    // parallelism is whatever its source files gave it (a single
    // parquet file = ONE task doing every minhash — measured 3.2 s of
    // the sf1 replay per batch on one core), and the heavy text scan
    // below deserves the machine. Micro-batches skip the exchange.
    val widened = if (width > 0) batch.repartition(width) else batch
    val scored0 = widened
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
      .filter(col("quality") >= minQuality)
      .withColumn("sig_", Dedup.minhashSigColumn(col("text"), 32))
      .localCheckpoint()
    val scored = scored0.drop("sig_")
    val batchSigs = scored0
      .select(col("doc_id").as("doc_id_"), col("sig_").as("sig"))
      .filter(size(col("sig")) > 0)
    val batchIds = scored.select(col("doc_id").as("doc_id_")).distinct()
    // the PREVIOUS store versions, pinned by path now (resolveBase
    // reads the pointer at call time) — safe to consume while the
    // merges below publish the next versions (retention keeps them)
    val prevSigs = MergeUpsert.existingPlain(spark, sigsPath(workDir))
    val prevDocs = MergeUpsert.existingPlain(spark, docsPath(workDir))
    // The two store merges run in the BACKGROUND while the caller
    // thread drives the whole candidate→verify→pairs chain — legal
    // because nothing in that chain needs the post-merge versions:
    // candidates derive from prev ∪ batchSigs (row-identical to the
    // version fSigs is publishing, see candidatesVsPrev), and every
    // candidate pair has ≥ 1 member IN the batch (text in `scored`)
    // while its other member is either also in the batch or in the
    // PREVIOUS docs version (text in `prevDocs`). Serially the merges
    // stacked ~1 s/batch of pure store round-trip latency (measured);
    // overlapped they hide behind the verify chain entirely. The
    // futures' frames are bound to `spark` (session conf, not
    // thread-locals, drives their plans), and both are awaited before
    // the batch returns — the stream's durability barrier.
    val fDocs = Future {
      MergeUpsert.mergeWritePlain(spark, docsPath(workDir), scored,
        Seq("doc_id"))
    }
    val fSigs = Future {
      MergeUpsert.mergeWritePlain(spark, sigsPath(workDir), batchSigs,
        Seq("doc_id_"))
    }
    // candidates materialized (they are consumed twice below, and must
    // be consumed before the store version window moves anyway)
    val cands = IncrementalDedup.candidatesVsPrev(prevSigs, batchSigs,
      batchIds, minEstJaccard = 0.25, repartitionTo = width)
      .localCheckpoint()
    // verify touches only the docs the candidates involve — O(batch
    // candidates), NOT a per-batch n-gram pass over the whole corpus.
    // Batch-side text comes from the in-memory checkpoint; only
    // corpus-side members (anti the batch) read the previous docs
    // version. Intra-batch duplicate ids (at-least-once redelivery
    // inside one batch: same bytes) can duplicate verified rows —
    // the pairs merge's key dedup absorbs them.
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
    // the n-gram verify is the batch's second compute-heavy scan; on
    // a replay-scale batch it inherits narrow parallelism (its input
    // is a micro-batch-sized join), so it runs width-wide and
    // materializes BEFORE the pairs merge — the merge round-trip then
    // moves only slim verified rows. Same-thread nesting of the scoped
    // conf restores outside-in; the background merges above read
    // whatever sizing is current when they plan, which is harmless for
    // their metadata-scale stages. Micro-batches keep the lazy narrow
    // verify (one fewer materialization round).
    val verified =
      if (width > 0)
        graft.ScopedSessionConf.withShufflePartitions(spark, width) {
          Dedup.verifyCandidates(involved.repartition(width), "doc_id",
            "text", cands, minJaccard = 0.4).localCheckpoint()
        }
      else
        Dedup.verifyCandidates(involved, "doc_id", "text", cands,
          minJaccard = 0.4)
    MergeUpsert.mergeWritePlain(spark, pairsPath(workDir), verified,
      Seq("id_a", "id_b"))
    // durability barrier: the batch commits only after every store
    // version this batch produced is published
    Await.result(fDocs, Duration.Inf)
    Await.result(fSigs, Duration.Inf)
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
