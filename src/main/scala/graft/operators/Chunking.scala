package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Context-window chunking: split each document into overlapping token
  * windows (size `window`, step `stride` — stride < window gives the
  * overlap that preserves cross-boundary context), the
  * document→training-example fan-out every pre-training pipeline runs.
  *
  * Scale shape: pure per-row fan-out — tokenize once, `posexplode` the
  * window starts, `slice` each chunk — all codegen'd builtins, no
  * shuffle, no UDFs; output rows stream straight to the sink. Chunk
  * content rides as an md5 hash (plus start/length) so the output stays
  * scalar-verifiable; a production sink would carry the token slice
  * itself. */
object Chunking {

  /** (doc_id, chunk_id, start_tok, n_tok, chunk_hash) — token-less
    * documents yield no chunks; the final chunk may be shorter than
    * `window` (standard tail handling). */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be >= 1")
    df.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("tk"))
      // the n>0 guard matters: sequence(0, -1, stride) would DESCEND
      // (Spark semantics), manufacturing garbage chunks for empty docs
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(0), size(col("tk")) - 1, lit(stride)))
          .as(Seq("chunk_id", "start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(slice(col("tk"), col("start_tok") + 1, lit(window)))
          .cast("long").as("n_tok"),
        md5(concat_ws(" ",
          slice(col("tk"), col("start_tok") + 1, lit(window)))).as("chunk_hash"))
  }

  /** Sentence-aware chunk packing — the RAG / pre-training splitter
    * that respects sentence boundaries instead of cutting mid-sentence
    * ([[tokenWindows]] is the fixed-stride variant): segment with the
    * portable `[^.!?]+[.!?]*` pattern (no lookbehind — RE2 lacks it,
    * so oracles can replay the split), run a per-doc running token
    * sum, and assign each sentence to chunk (start-offset div budget)
    * — the [[packSequences]] model at sentence grain. A sentence
    * longer than `budget` gets its own chunk(s) by construction.
    *
    * Scale shape: explode + ONE window partitioned by doc (per-doc
    * state, parallel across docs) + one hash agg. Returns
    * (doc_id, chunk_id, n_sentences, n_tokens). */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
                     budget: Long): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("sidx")
    df.select(col(idCol).as("doc_id"),
        posexplode(regexp_extract_all(col(textCol),
          lit("[^.!?]+[.!?]*"), lit(0))).as(Seq("sidx", "sent")))
      .withColumn("n_tok",
        size(TextFunctions.tokens(col("sent"))).cast("long"))
      // whitespace-only fragments carry no tokens and pack nothing
      .filter(col("n_tok") > 0)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("chunk_id", expr(s"(cum - n_tok) div $budget"))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_sentences"),
        sum(col("n_tok")).as("n_tokens"))
  }

  /** Deterministic SEQUENCE PACKING: assign documents to fixed-length
    * training sequences by contiguous fill — doc d starts at the
    * running token offset of its shard, and its sequence id is that
    * offset divided by `seqLen` (the "concat then cut every seqLen
    * tokens" model every packed-pre-training loader uses; a doc longer
    * than the remaining room simply spans into the next sequence, and
    * [[tokenWindows]] is the splitter when per-example boundaries must
    * not cross documents).
    *
    * Deterministic by construction: the fill order is (shard, doc_id),
    * independent of partition layout, so the packing is reproducible
    * run-to-run and engine-to-engine (the oracle replays it as a
    * windowed cumulative sum).
    *
    * Scale shape: ONE window aggregation partitioned by `shardCol` —
    * state per task is a running long, and shards (language, source,
    * date bucket…) bound each window's data; there is no global
    * total-order shuffle, which is what makes this runnable at 100 TB
    * (a single global ORDER BY cumsum would serialize the corpus
    * through one task). Returns (doc_id, shard, n_tok, seq_id,
    * offset) — offset = the doc's start position within its sequence. */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
                    shardCol: String, seqLen: Int): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    df.select(col(idCol).as("doc_id"), col(shardCol).as("shard"),
        col(nTokCol).cast("long").as("n_tok"))
      .withColumn("end_tok", sum("n_tok").over(w))
      // doc_id must be unique per shard: the RANGE frame treats equal
      // ids as peers, so duplicates would silently double-pack the
      // same token span. Duplicate ids sort adjacent, so one lag()
      // over the SAME window (no extra exchange) turns silent
      // corruption into a loud failure.
      .withColumn("end_tok",
        // null-safe <=>: two NULL doc_ids are still duplicates, and a
        // null-unsafe === would let exactly that pair double-pack
        when(lag(col("doc_id"), 1).over(w) <=> col("doc_id"),
          raise_error(concat(
            lit("packSequences: duplicate doc_id within shard: "),
            // coalesce: a NULL id/shard must not null out the whole
            // concat (raise_error(NULL) reports a blank "null" message)
            coalesce(col("doc_id").cast("string"), lit("NULL")),
            lit(" / "),
            coalesce(col("shard").cast("string"), lit("NULL")))))
          .otherwise(col("end_tok")))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        // integer `div`, not `/`: the double round-trip would lose
        // exactness past 2^53 cumulative tokens
        expr(s"(end_tok - n_tok) div ${seqLen.toLong}").as("seq_id"),
        ((col("end_tok") - col("n_tok")) % lit(seqLen.toLong)).as("offset"))
  }

  /** Content-defined chunking (the FastCDC/rsync family): a chunk
    * boundary falls after character position i whenever the rolling
    * polynomial hash of the `w`-char window ENDING at i (the winnow
    * k-gram hash, Σ cp·31^j) is ≡ 0 mod `mask+1` — so boundaries move
    * with content, not offsets, and an insertion near the head of a
    * document only perturbs the chunks that overlap it (the property
    * that makes chunk-hash dedup robust to prefix edits where
    * fixed-stride chunking re-hashes everything; see CdcChunkSpec's
    * shift-locality case). Expected chunk length is `mask+1` chars;
    * the document end is always a boundary.
    *
    * Scale shape: boundary detection is ONE codegen'd rolling pass —
    * O(1) per character ([[graft.plans.CdcBoundaries]]; a per-position
    * digest would burn ~100× on the scan's hot loop at 100 TB) — then
    * one posexplode for the chunks; no UDFs, no shuffle. Callers
    * aggregate the (chunk_hash) stream or sink it.
    *
    * Returns (doc_id, chunk_idx, chunk_len, chunk_hash) with
    * `carryCols` passed through; empty documents yield no chunks,
    * documents of ≤ w chars are a single chunk. chunk_hash is the
    * portable md5-60 of the chunk text (once per CHUNK, not per
    * position). */
  /** Column names [[cdcChunks]] owns — its outputs plus the
    * intermediates of the boundary walk. A carry column with one of
    * these names would be silently shadowed (or break resolution
    * mid-chain), so the operator refuses it loudly instead. */
  private val CdcReserved = Set("doc_id", "txt_", "bnds_", "pos_", "k_",
    "start_", "chunk_idx", "chunk_len", "chunk_hash")

  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                w: Int = 8, mask: Int = 63,
                carryCols: Seq[String] = Seq.empty): DataFrame = {
    require(w >= 2 && mask >= 1, "window must be >= 2, mask >= 1")
    val clash = carryCols.filter(CdcReserved)
    require(clash.isEmpty,
      s"carryCols ${clash.mkString(", ")} collide with cdcChunks' " +
        s"reserved output/intermediate names " +
        s"(${CdcReserved.toSeq.sorted.mkString(", ")}) — rename before " +
        "chunking")
    val bnds = org.apache.spark.sql.graft.bridge.column(
      graft.plans.CdcBoundaries(
        org.apache.spark.sql.graft.bridge.expression(col("txt_")), w, mask))
    df.select((col(idCol).as("doc_id") +: col(textCol).as("txt_") +:
        carryCols.map(col)): _*)
      .filter(length(col("txt_")) > 0)
      .withColumn("bnds_", bnds)
      .select((col("doc_id") +: col("txt_") +: col("bnds_") +:
        posexplode(sequence(lit(1), size(col("bnds_"))))
          .as(Seq("pos_", "k_")) +: carryCols.map(col)): _*)
      .withColumn("start_",
        // element_at(_, 0) throws in Spark; the first chunk starts at 0
        when(col("k_") === 1, lit(0))
          .otherwise(element_at(col("bnds_"), col("k_") - 1)))
      .withColumn("chunk_len",
        (element_at(col("bnds_"), col("k_")) - col("start_")).cast("long"))
      .select((col("doc_id") +: (col("k_") - 1).cast("long").as("chunk_idx") +:
        col("chunk_len") +:
        TextFunctions.md5Hash60(
          expr("substring(txt_, start_ + 1, chunk_len)")).as("chunk_hash") +:
        carryCols.map(col)): _*)
  }

  /** Per-group chunk-level dedup report over [[cdcChunks]]: how much
    * of each group's character mass is duplicated at CDC-chunk grain —
    * the storage-dedup dashboard row (and the cheap upper-bound signal
    * for document near-duplication: shared boilerplate shows up here
    * before any pair join runs). One hash-aggregate over the chunk
    * stream; dup_ratio = 1 − distinct/total, floor-rounded 4dp. */
  def cdcChunkStats(df: DataFrame, idCol: String, textCol: String,
                    groupCol: String, w: Int = 8, mask: Int = 63)
      : DataFrame =
    cdcChunks(df, idCol, textCol, w, mask, carryCols = Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("chunk_hash")).as("n_distinct"),
        sum(col("chunk_len")).as("total_chars"),
        TextFunctions.portableRound(
          lit(1.0) - countDistinct(col("chunk_hash")).cast("double") /
            count(lit(1)).cast("double"), 4).as("dup_ratio"))
      .orderBy(col(groupCol))

  /** Incremental CDC chunk ledger: upsert a batch's chunk rows into a
    * keyed store — the chunk-grain sibling of
    * [[IncrementalDedup.appendExact]] (doc grain) and the incremental
    * face of [[cdcChunkStats]]. The store is keyed on
    * (doc_id, chunk_idx), NOT hash-aggregated, for the same reason
    * appendExact is doc-keyed: a redelivered batch upserts the same
    * rows and the ledger is unchanged (at-least-once idempotence);
    * first-seen attribution is derived at READ time as min(batch) per
    * hash, so it cannot be corrupted by replay order. Per-append text
    * work is one chunking pass over the batch; reports run over slim
    * (id, idx, hash, len, batch) rows. */
  def appendCdcChunks(spark: org.apache.spark.sql.SparkSession,
                      storePath: String, batch: DataFrame,
                      idCol: String, textCol: String, batchTag: Long,
                      w: Int = 8, mask: Int = 63,
                      retainVersions: Int = 2): Unit =
    MergeUpsert.mergeWritePlain(spark, storePath,
      cdcChunks(batch, idCol, textCol, w, mask)
        .select(col("doc_id").as("doc_id_"), col("chunk_idx"),
          col("chunk_hash"), col("chunk_len"), lit(batchTag).as("batch")),
      Seq("doc_id_", "chunk_idx"), retainVersions)

  /** Grouped form of [[appendCdcChunks]]: chunk several tagged batches
    * and land them in ONE store publish. N sequential appends cost N
    * store round-trips (read base + version write + pointer flip — the
    * x59 job-latency class, ~0.7 s each at micro-batch scale) for work
    * whose data volume is one batch union; a backfill or a drained
    * stream's catch-up should pay ONE. Converges to exactly the state
    * sequential appends in ascending tag order reach: per
    * (doc_id, chunk_idx) key the highest tag's row wins here, which is
    * the sequential path's last-writer-wins outcome — and under the
    * ledger's content-stable contract (same doc_id ⇒ same bytes) the
    * competing rows differ only in the `batch` tag anyway
    * (CdcChunkSpec proves the equivalence). */
  def appendCdcChunksBatches(spark: org.apache.spark.sql.SparkSession,
                             storePath: String,
                             batches: Seq[(Long, DataFrame)],
                             idCol: String, textCol: String,
                             w: Int = 8, mask: Int = 63,
                             retainVersions: Int = 2): Unit = {
    require(batches.nonEmpty, "appendCdcChunksBatches needs >= 1 batch")
    val tagged = batches.map { case (tag, b) =>
      cdcChunks(b, idCol, textCol, w, mask)
        .select(col("doc_id").as("doc_id_"), col("chunk_idx"),
          col("chunk_hash"), col("chunk_len"), lit(tag).as("batch"))
    }.reduce(_ unionByName _)
    // in-group LWW: the highest batch tag per key, resolved BEFORE the
    // single merge (mergeWritePlain's own dropDuplicates is
    // order-arbitrary and must not pick the winner)
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id_", "chunk_idx")
      .orderBy(col("batch").desc)
    val resolved = tagged
      .withColumn("rn_", row_number().over(byKey))
      .filter(col("rn_") === 1).drop("rn_")
    MergeUpsert.mergeWritePlain(spark, storePath, resolved,
      Seq("doc_id_", "chunk_idx"), retainVersions)
  }

  /** Per-batch novelty report over the accumulated ledger: how much of
    * each batch's chunk mass had never been seen in any EARLIER batch —
    * the "does this crawl still bring new content" curve that decides
    * when a source is exhausted (x199's question at chunk grain,
    * robust to re-wrapped/re-ordered documents because CDC boundaries
    * move with content). novel = distinct hashes whose first-seen
    * batch is this batch; ratio over the batch's distinct hashes.
    * Returns (batch, n_chunks, n_distinct, n_novel, novel_ratio). */
  def cdcStoreReport(spark: org.apache.spark.sql.SparkSession,
                     storePath: String, roundTo: Int = 4): DataFrame = {
    val rows = MergeUpsert.readPlain(spark, storePath)
    val firstSeen = rows.groupBy("chunk_hash")
      .agg(min("batch").as("first_batch"))
    val perBatchHash = rows.groupBy("batch", "chunk_hash")
      .agg(count(lit(1)).as("occ"))
    perBatchHash.join(firstSeen, Seq("chunk_hash"))
      .groupBy("batch")
      .agg(sum("occ").as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("first_batch") === col("batch"), 1L).otherwise(0L))
          .as("n_novel"),
        TextFunctions.portableRound(
          sum(when(col("first_batch") === col("batch"), 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"), roundTo)
          .as("novel_ratio"))
      .orderBy("batch")
  }
}
