package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup detection against a persisted signature store —
  * the 100 TB deployment shape: a petabyte corpus is never
  * re-deduplicated from scratch; each arriving batch computes its
  * MinHash signatures ONCE, persists them, and generates candidate
  * pairs batch-vs-corpus only. The expensive text-derived work
  * (shingling + hashing, the only stage that touches document bytes)
  * is O(batch); the corpus side re-reads nothing but its slim
  * (doc_id, sig) signature table.
  *
  * Store layout: a [[MergeUpsert.mergeWritePlain]]-versioned parquet
  * table keyed on doc_id_ — idempotent re-appends (the reference
  * pipeline's re-ingest model: ingest_capacity.py:179-193 re-ingests
  * files idempotently via keyed upsert, extended here to the curation
  * surface), atomic version publish, retention window for readers.
  *
  * Completeness invariant (oracle x38): the union of candidate pairs
  * emitted across appends equals a from-scratch [[Dedup.minhashLsh]]
  * run on the union corpus. Induction: a pair's emission time is the
  * append of its later-arriving member — appendBatch emits exactly the
  * pairs with ≥1 member in the batch, and earlier appends emitted the
  * rest. The `maxBucket` valve is evaluated against the union-so-far
  * at each emission: a bucket that grows past the cap LATER stops
  * producing new pairs from that point on, but pairs already emitted
  * stand (a from-scratch run would drop the whole bucket) — at default
  * caps no test-scale bucket comes near the valve, so the invariant is
  * exact there. A re-appended doc overwrites its store row (signatures
  * are deterministic, so the store is unchanged) and its pairs are
  * RE-emitted — consumers keyed on (id_a, id_b) absorb this, the same
  * idempotence contract as the merge sink.
  */
object IncrementalDedup {

  /** Merge the batch's MinHash signatures into the store, then emit
    * candidate pairs involving the batch (batch×corpus ∪ batch×batch).
    * One pass over the batch text; the candidate plan reads signatures
    * back from the just-published immutable store version (pinned by
    * path, so later appends don't shift it under a lazy consumer —
    * consume within `retainVersions - 1` further appends).
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b. */
  def appendBatch(spark: SparkSession, storePath: String, batch: DataFrame,
                  idCol: String, textCol: String,
                  bands: Int = 8, rowsPerBand: Int = 4,
                  minEstJaccard: Double = 0.0, maxBucket: Int = 10000,
                  retainVersions: Int = 2): DataFrame = {
    val numHashes = bands * rowsPerBand
    MergeUpsert.mergeWritePlain(spark, storePath,
      Dedup.minhashSignatures(batch, idCol, textCol, numHashes),
      Seq("doc_id_"), retainVersions)
    val live = MergeUpsert.currentPlainVersion(spark, storePath).getOrElse(
      throw new IllegalStateException(
        s"signature store $storePath has no live version after merge"))
    // id-column-only scan of the batch (parquet reads one column) to
    // flag which store rows are new this append
    val batchIds = batch.select(col(idCol).as("doc_id_")).distinct()
    candidatesVsCorpus(spark.read.parquet(s"$storePath/$live"), batchIds,
      bands, rowsPerBand, minEstJaccard, maxBucket)
  }

  /** The store's live signature table (doc_id_, sig). */
  def signatures(spark: SparkSession, storePath: String): DataFrame =
    MergeUpsert.readPlain(spark, storePath)

  /** [[appendBatch]]'s candidate stage decoupled from its store merge,
    * for callers that run the two CONCURRENTLY (StreamCuration): pairs
    * are computed against (previous store version ∪ batch signatures)
    * with the batch's rows replacing any redelivered doc's old row —
    * row-identical to the version the merge is publishing in parallel,
    * because the merge IS that anti-join-union and signatures are a
    * deterministic function of text. The candidate join therefore no
    * longer waits for the publish round-trip (measured ~0.4 s/batch of
    * pure serialization at micro-batch scale), and it never re-reads
    * the store it just wrote. Same banding, caps and est_jaccard
    * arithmetic as [[appendBatch]] — the x38 union-equivalence
    * invariant carries over verbatim (StreamCurationSpec pins the
    * fixpoint; the caller must still consume the result before the
    * prev version leaves the retention window). */
  def candidatesVsPrev(prevSigs: Option[DataFrame], batchSigs: DataFrame,
                       batchIds: DataFrame,
                       bands: Int = 8, rowsPerBand: Int = 4,
                       minEstJaccard: Double = 0.0,
                       maxBucket: Int = 10000,
                       repartitionTo: Int = 0): DataFrame = {
    // the anti-join keys on batchSigs' ids — the SAME key set the
    // concurrent merge replaces — not on batchIds (r14 advice): a
    // batch doc whose current sig is empty but whose stored sig is
    // non-empty (possible only outside the same-bytes redelivery
    // contract) must keep its stored row here exactly as the merge
    // keeps it, or the union stops being row-identical to the version
    // the merge is publishing
    val union = prevSigs match {
      case Some(prev) =>
        prev.join(batchSigs.select("doc_id_"), Seq("doc_id_"), "left_anti")
          .unionByName(batchSigs)
      case None => batchSigs
    }
    // band-key hashing is map-side work whose parallelism is the
    // store's FILE layout (a store published at micro-batch shuffle
    // sizing reads back ~4-way). For a replay/backfill-scale batch
    // (`repartitionTo` > 0, the caller's batch-size decision) the slim
    // sig rows take one width-restoring exchange, which measured
    // cheaper than banding the corpus on four cores (3.2 → ~1 s/batch
    // on the sf1 replay); micro-batches skip it.
    val wide =
      if (repartitionTo > 0) union.repartition(repartitionTo) else union
    candidatesVsCorpus(wide, batchIds, bands,
      rowsPerBand, minEstJaccard, maxBucket)
  }

  /** Incremental EXACT dedup: upsert the batch's (doc_id_, text_hash)
    * rows into a keyed store, then derive the exact-dup report. The
    * store is doc-keyed, NOT hash-aggregated, deliberately: an
    * aggregated (hash → min_id, count) store would double-count a
    * redelivered batch, while the keyed upsert is idempotent under the
    * same at-least-once contract as [[appendBatch]]. Per-append text
    * work is one md5 pass over the batch; the report aggregation runs
    * over slim (id, hash) rows — never document text. */
  def appendExact(spark: SparkSession, storePath: String, batch: DataFrame,
                  idCol: String, textCol: String,
                  retainVersions: Int = 2): DataFrame = {
    MergeUpsert.mergeWritePlain(spark, storePath,
      batch.select(col(idCol).as("doc_id_"),
        md5(col(textCol)).as("text_hash")),
      Seq("doc_id_"), retainVersions)
    exactReport(spark, storePath)
  }

  /** The exact-dup report over the accumulated store: one row per
    * distinct text (keep_id = smallest doc id carrying it) — equals
    * [[Dedup.exact]] on the union corpus by construction. */
  def exactReport(spark: SparkSession, storePath: String): DataFrame =
    MergeUpsert.readPlain(spark, storePath)
      .groupBy("text_hash")
      .agg(min("doc_id_").as("keep_id"), count(lit(1)).as("n_copies"))

  /** Candidate pairs over `storeSigs` with at least one member in
    * `batchIds`, bucketed exactly like [[Dedup.minhashLsh]] over the
    * whole store (same band keys, same union-wide bucket cap — corpus
    * band rows derive from the slim signature table, never corpus
    * text — same est_jaccard arithmetic). Corpus-internal pairs are
    * NOT regenerated — that is the point. */
  def candidatesVsCorpus(storeSigs: DataFrame, batchIds: DataFrame,
                         bands: Int, rowsPerBand: Int,
                         minEstJaccard: Double, maxBucket: Int): DataFrame = {
    val numHashes = bands * rowsPerBand
    val banded = Dedup
      .capBuckets(Dedup.bandKeys(storeSigs, bands, rowsPerBand),
        "band_key", maxBucket)
    // the probe side is the BATCH's banded rows only (a semi-join on
    // the batch ids): per-bucket join work is new_k × bucket_k, not
    // bucket_k² — an all×all self-join with a residual "one side is
    // new" predicate would re-enumerate every corpus-internal
    // same-bucket pair on every append just to discard it
    val newSide = banded
      .join(batchIds.select("doc_id_"), Seq("doc_id_"), "left_semi")
    val eqCount = org.apache.spark.sql.graft.bridge.column(
      graft.plans.ArrayEqCount(
        org.apache.spark.sql.graft.bridge.expression(col("a.sig")),
        org.apache.spark.sql.graft.bridge.expression(col("b.sig"))))
    // batch-internal pairs match in both orders; least/greatest
    // canonicalization + the pair dedup collapse them (n_match is
    // symmetric, so both orders carry identical rows)
    newSide.as("a").join(banded.as("b"),
        col("a.band_key") === col("b.band_key") &&
          col("a.doc_id_") =!= col("b.doc_id_"))
      .select(least(col("a.doc_id_"), col("b.doc_id_")).as("id_a"),
        greatest(col("a.doc_id_"), col("b.doc_id_")).as("id_b"),
        eqCount.as("n_match"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_match").cast("double") / lit(numHashes.toDouble))
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }
}
