package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** TF-IDF keyword extraction: the top-k most characteristic terms per
  * document — corpus summarization / topic tagging for curation
  * dashboards and domain-mix reports.
  *
  * The score is tf · N / df (the log-free tf-idf variant): tf, N, df
  * are exact integers, so the single IEEE division makes the score
  * bit-identical on any engine — a `ln`-based idf would hinge on libm
  * rounding and could flip rank ties across engines. Ties break on the
  * term itself for full determinism.
  *
  * Scale shape: one (doc, term) hash aggregation (map-side combined),
  * one term-level df aggregation joined back on term (a term-keyed
  * shuffle), the corpus size via a broadcast single-row cross join (no
  * driver action), and a per-doc top-k window. All linear in corpus
  * token count; the df join is the classic skew point (stopwords) —
  * at 100 TB pair it with [[Salting]] or a stopword pre-filter. */
object TfIdf {

  /** (doc_id, term, tf, score, rn) for the top `k` terms per document,
    * lowercased tokens; rank by (score desc, term asc). */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus size as ONE scalar count job (the k-means-centroid
    // pattern: O(1) driver data to parameterize the plan) — folding it
    // in as a literal keeps the scoring projection a pure codegen pass
    // instead of threading a 1-row broadcast through every stage
    val nDocs = df.count().toDouble
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("score",
        col("tf").cast("double") * lit(nDocs) / col("df").cast("double"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("score"),
        col("rn").cast("int").as("rn"))
  }
}
