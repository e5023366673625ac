package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted character-n-gram index for exact substring search — "grep
  * the corpus" without scanning every document per query (contamination
  * lookups, quote tracing, PII re-scans all reduce to it). Each query
  * string's distinct grams are intersected against the index
  * (candidate = document containing ALL of them), then the candidates
  * alone are verified with an exact `contains` — the classic
  * trigram-index shape (PostgreSQL pg_trgm, Google Code Search).
  *
  * Scale shape: the index is one distinct-shuffle of (gram, doc_id)
  * pairs built by the codegen'd [[graft.plans.NgramsLong]] (grams
  * bijectively packed into longs — primitive joins, no string keys);
  * a query touches only its grams' postings, and the expensive
  * `contains` verify runs on the intersected candidates, not the
  * corpus. False positives before verify are exactly the documents
  * with all grams present but never adjacent.
  */
object GramIndex {

  private def gramsOf(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.NgramsLong(
        org.apache.spark.sql.graft.bridge.expression(c), n))

  /** The inverted index: distinct (gram, doc_id) postings. */
  def build(df: DataFrame, idCol: String, textCol: String,
            n: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(gramsOf(col(textCol), n)).as("gram"))
      .distinct()

  /** Exact substring search through the index. Queries shorter than
    * `n` produce no grams and match nothing (callers wanting short
    * needles should scan — an n-gram index cannot serve them).
    * Output: (qid, doc_id) verified matches. */
  def search(queries: DataFrame, qidCol: String, qCol: String,
             index: DataFrame, docs: DataFrame, idCol: String,
             textCol: String, n: Int = 3): DataFrame = {
    val qg = queries.select(col(qidCol).as("qid"), col(qCol).as("q"),
      explode(array_distinct(gramsOf(col(qCol), n))).as("gram"))
    val need = qg.groupBy("qid").agg(count(lit(1)).as("n_need"))
    val cand = qg.join(index, "gram")
      .groupBy("qid", "doc_id").agg(count(lit(1)).as("n_hit"))
      .join(need, "qid")
      .filter(col("n_hit") === col("n_need"))
      .select("qid", "doc_id")
    cand
      .join(broadcast(queries.select(col(qidCol).as("qid"),
        col(qCol).as("q"))), "qid")
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("txt")),
        "doc_id")
      .filter(col("txt").contains(col("q")))
      .select("qid", "doc_id")
  }
}
