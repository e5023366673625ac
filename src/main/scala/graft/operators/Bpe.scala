package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic byte-pair-encoding subword training and encoding —
  * the tokenizer-construction step of a training-data pipeline (count
  * the pieces a corpus will actually cost BEFORE paying for them, and
  * audit how a vocabulary will segment a new corpus).
  *
  * Classic BPE (Sennrich et al. 2016, arXiv:1508.07909) over the
  * corpus's distinct lowercased words: start from single characters,
  * repeatedly merge the globally most frequent adjacent symbol pair.
  * Everything is deterministic and cross-engine replayable:
  *   - pair selection is exact integer counts with (count desc, left
  *     asc, right asc) tiebreak — UTF-8 byte order, which both engines
  *     share;
  *   - each merge application is a sequential left fold over the
  *     symbol sequence (greedy left-to-right, no re-merge of the just
  *     merged symbol) — the oracle replays it as a delimited-string
  *     fold, this side as an array fold, same semantics;
  *   - words containing U+001F (the oracle's symbol separator) or any
  *     beyond-BMP code point fall back to ONE whole-word piece and are
  *     excluded from pair statistics — the byte-fallback analog, and
  *     what keeps `substr`-by-code-unit (JVM) and slice-by-code-point
  *     (DuckDB) in agreement (they differ only beyond the BMP).
  *
  * Scale shape: training runs on the DISTINCT-WORD table (vocabulary,
  * not corpus — Zipf makes this tiny relative to token count) with one
  * map-side-combined pair aggregation + one O(1) argmax collect per
  * merge, the k-means training pattern; production vocabularies train
  * on a corpus sample anyway. Encoding joins the exploded corpus
  * against the trained word→pieces table (broadcast when the vocab
  * allows) — the corpus itself never re-folds. */
object Bpe {

  val Sep = "\u001f" // unit separator: the oracle's symbol delimiter

  case class Merge(rank: Int, lhs: String, rhs: String)

  /** Words excluded from training: separator collision or beyond-BMP. */
  def fallbackWord(c: Column): Column =
    c.contains(Sep) || c.rlike("[\\x{10000}-\\x{10FFFF}]")

  /** Greedy merge passes over a symbol-array column, one full
    * left-to-right pass per merge in order — the native
    * [[graft.plans.BpeMergePasses]] expression (the interpreted
    * `aggregate`-lambda fold it replaces cost minutes per 64-merge
    * round at a 100k-word vocabulary). */
  private def applyMerges(syms: Column,
                          merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.BpeMergePasses(
        org.apache.spark.sql.graft.bridge.expression(syms), merges))

  /** The distinct-word working table: (w, cnt, syms).
    * localCheckpoint, not cache, every generation: cache truncates
    * execution but NOT lineage — 20 generations of nested fold
    * lambdas make the logical plan itself driver-fatal (the
    * resolveClusters lesson, PERF.md r4). Checkpointing pins only the
    * materialized partitions of the tiny distinct-word table.
    * empty-token guard: sequence(1, 0) runs DESCENDING in Spark (the
    * x46 footgun), which would hand the tokenizer's empty-string edge
    * token two phantom symbols; both engines give it an empty symbol
    * list → zero pieces */
  private def initWork(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .filter(!fallbackWord(col("w")))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"),
        when(length(col("w")) === 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), length(col("w"))),
            i => col("w").substr(i, lit(1)))).as("syms"))
      .localCheckpoint()

  /** Adjacent-pair frequencies of the working table, in selection
    * order: exact integer counts, (count desc, left asc, right asc)
    * tiebreak. */
  private def pairCounts(work: DataFrame): DataFrame =
    work.filter(size(col("syms")) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("c"))
      .orderBy(desc("c"), col("a"), col("b"))

  /** Train `numMerges` merges; returns (merge table, word→pieces
    * vocabulary of the non-fallback words). Early exhaustion (no
    * adjacent pairs left) yields fewer merges; later ranks are no-ops
    * on both engines. One driver round-trip per merge — the oracle
    * path; at real vocabulary sizes use [[trainBatched]]. */
  def train(df: DataFrame, textCol: String,
            numMerges: Int): (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var work = initWork(df, textCol)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var exhausted = false
    for (r <- 1 to numMerges if !exhausted) {
      val best = pairCounts(work).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(r, a, b)
        work = work.select(col("w"), col("cnt"),
          applyMerges(col("syms"), Seq((a, b))).as("syms")).localCheckpoint()
      }
    }
    (merges.toSeq,
      work.select(col("w"), size(col("syms")).cast("long").as("n_pieces")))
  }

  /** Batched training: per ROUND, one pair aggregation selects the
    * top-`batchSize` mutually NON-CONFLICTING pairs (in the same
    * (count desc, left, right) order as [[train]]), which are then
    * applied as one chained greedy pass and one checkpoint — 32k
    * merges cost ~32k/batchSize cluster round-trips instead of 32k.
    * The standard scaled-BPE batching technique (cf. the multi-merge
    * step in fast BPE trainers such as YouTokenToMe).
    *
    * Non-conflict rule (conservative): an accepted pair claims its
    * left symbol, right symbol, and merged string; a candidate
    * touching any claimed symbol is deferred to a later round. Under
    * that rule no accepted merge can change another accepted pair's
    * occurrence count, so within a round the batch equals the
    * sequential selection whenever sequential's next pick is also
    * conflict-free (BpeSpec proves batched ≡ sequential on such a
    * corpus, and that batchSize = 1 degenerates to [[train]] exactly).
    * Where they diverge (a deferred conflicting pair, or a
    * new-symbol pair outranking the batch tail), batched is the
    * documented approximation every production tokenizer ships. */
  def trainBatched(df: DataFrame, textCol: String, numMerges: Int,
                   batchSize: Int = 64): (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    var work = initWork(df, textCol)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val m = math.min(batchSize, numMerges - merges.size)
      // headroom: conflicts defer candidates, so over-fetch the top
      val cands = pairCounts(work).limit(m * 4 + 8).collect()
      if (cands.isEmpty) exhausted = true
      else {
        val accepted = scala.collection.mutable.ArrayBuffer[(String, String)]()
        val claimed = scala.collection.mutable.Set[String]()
        for (r <- cands if accepted.size < m) {
          val (a, b) = (r.getString(0), r.getString(1))
          val parts = Seq(a, b, a + b)
          if (parts.forall(!claimed.contains(_))) {
            accepted += ((a, b))
            claimed ++= parts
          }
        }
        // one native multi-pass application in accepted order
        // (identical semantics to m sequential passes), one checkpoint
        work = work.select(col("w"), col("cnt"),
            applyMerges(col("syms"), accepted.toSeq).as("syms"))
          .localCheckpoint()
        accepted.foreach { case (a, b) =>
          merges += Merge(merges.size + 1, a, b)
        }
      }
    }
    (merges.toSeq,
      work.select(col("w"), size(col("syms")).cast("long").as("n_pieces")))
  }

  /** Per-document encoding statistics under a trained vocabulary:
    * (doc_id, n_tok, n_pieces). Fallback / out-of-vocabulary words
    * count one piece. */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
                  vocab: DataFrame): DataFrame = {
    val per = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .join(vocab, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(coalesce(col("n_pieces"), lit(1L))).cast("long").as("n_pieces"))
    df.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }
}
