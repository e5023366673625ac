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
}
