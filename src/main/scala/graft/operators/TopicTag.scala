package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Keyword-taxonomy document tagging — the domain-routing pass of a
  * training-data pipeline (bucket documents into topical mixes before
  * sampling, the DCLM/Dolma-style "which pile does this go in"): a
  * fixed topic → keyword dictionary, hit counts per topic over
  * whitespace tokens, winner by (hits desc, topic asc), `other` when
  * nothing matches.
  *
  * Scale shape: the dictionary is a broadcast literal (a few hundred
  * rows at most in practice); the token scan joins it with no shuffle
  * of the corpus, and the only shuffle is the (doc, topic) hit count —
  * bounded by docs × matched topics. Determinism is exact-integer:
  * counts and string tie-breaks only.
  */
object TopicTag {

  /** Demo taxonomy over the synthetic corpus vocabulary. A keyword
    * belongs to exactly ONE topic (enforced in [[tag]]) — overlapping
    * dictionaries would double-count a token. */
  val DefaultTaxonomy: Seq[(String, Seq[String])] = Seq(
    "execution" -> Seq("scan", "filter", "join", "sort", "agg", "group"),
    "retrieval" -> Seq("vector", "hash", "query", "key"),
    "storage"   -> Seq("table", "row", "column", "part"),
    "streaming" -> Seq("stream", "batch", "window"))

  /** Output: (doc_id, topic, hits) — one row per input document. */
  def tag(df: DataFrame, idCol: String, textCol: String,
          taxonomy: Seq[(String, Seq[String])] = DefaultTaxonomy): DataFrame = {
    val flat = taxonomy.flatMap { case (t, ws) => ws.map(w => (t, w)) }
    require(flat.map(_._2).distinct.size == flat.size,
      "taxonomy keywords must be unique across topics")
    val spark = df.sparkSession
    import spark.implicits._
    val kws = flat.toDF("topic", "kw")
    val hits = df
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("tk"))
      .join(broadcast(kws), col("tk") === col("kw"))
      .groupBy("doc_id", "topic").agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy("doc_id").orderBy(desc("hits"), col("topic"))
    val top = hits.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    df.select(col(idCol).as("doc_id"))
      .join(top, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("topic"), lit("other")).as("topic"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }
}
