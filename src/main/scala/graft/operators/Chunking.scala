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
}
