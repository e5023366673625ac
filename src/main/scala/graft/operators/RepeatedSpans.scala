package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact-substring repetition statistics — the deduplicate-repeated-
  * spans signal of Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better"), re-expressed as a distributed k-gram-hash
  * coverage computation instead of a suffix array (which is inherently
  * single-machine: it needs the whole corpus in one address space).
  *
  * A position p in a document is DUPLICATED if the k-token span starting
  * at p occurs at least twice in the corpus (anywhere — other documents
  * or elsewhere in the same one). The per-document statistic is the
  * number of tokens covered by the union of duplicated spans
  * [p, p+k−1], the same "fraction of tokens in a repeated substring of
  * ≥k tokens" a suffix array would report (k-gram counting finds
  * exactly the spans of length ≥ k, since any longer repeat is a run of
  * overlapping duplicated k-grams that the interval union re-merges).
  *
  * Scale shape (the part that must survive 100 TB):
  *   1. positional k-gram hashes — scan-time fan-out of (doc, pos, h)
  *      rows, 60-bit md5 hashes so the shuffle carries ~24 bytes per
  *      token, never the span text;
  *   2. one hash-partitioned window counts occurrences per h (a single
  *      shuffle; map-side nothing to combine since rows must survive);
  *   3. positions with count ≥ 2 — typically a small fraction of the
  *      corpus — shuffle AGAIN by doc for the gaps-and-islands interval
  *      union (running max of span end), so the second shuffle is
  *      proportional to the DUPLICATED subset only;
  *   4. left-join the per-doc coverage back to the full document list.
  * Every arithmetic step stays integer until the final fraction, which
  * is portable-rounded to 4 — bit-identical to the DuckDB oracle.
  */
object RepeatedSpans {

  /** Per-document repeated-span coverage over whitespace tokens.
    *
    * Returns (doc_id, n_tok, dup_tok, dup_frac, keep) — one row per
    * input document; documents shorter than k tokens report zero
    * coverage (they contain no k-span at all).
    *
    * @param k          span width in tokens (the minimum repeat length
    *                   the statistic can see)
    * @param maxDupFrac keep-threshold on the covered-token fraction
    */
  def spanStats(df: DataFrame, idCol: String, textCol: String,
                k: Int = 8, maxDupFrac: Double = 0.5): DataFrame = {
    require(k >= 1, s"span width must be >= 1, got $k")
    val base = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tok"),
        col("tk"))

    // sequence(0, n-k) would run DESCENDING for n < k (Spark generates
    // descending sequences when stop < start) — the n_tok >= k filter
    // is correctness, not just pruning.
    val grams = base.filter(col("n_tok") >= k)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("tk")) - k),
          i => TextFunctions.md5Hash60(
            concat_ws(" ", slice(col("tk"), i + 1, lit(k)))))))
      .select(col("doc_id"), col("pos"), col("col").as("h"))

    val dup = grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("c") >= 2)

    // gaps-and-islands union of [pos, pos+k-1] intervals per doc:
    // a position's fresh coverage is its span end minus the furthest
    // span end seen at earlier positions (clamped to [0, k]).
    val prevEnd = max(col("pos") + k).over(
      Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1))
    val cov = dup
      .withColumn("contrib", greatest(lit(0),
        col("pos") + k - greatest(coalesce(prevEnd, col("pos")), col("pos"))))
      .groupBy("doc_id")
      .agg(sum("contrib").cast("long").as("dup_tok"))

    base.select(col("doc_id"), col("n_tok"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("dup_tok"), lit(0L)).as("dup_tok"),
        when(col("n_tok") === 0, lit(0.0))
          .otherwise(TextFunctions.portableRound(
            coalesce(col("dup_tok"), lit(0L)).cast("double") /
              col("n_tok"), 4))
          .as("dup_frac"))
      .withColumn("keep", col("dup_frac") <= maxDupFrac)
  }

  /** The REMOVAL face of [[spanStats]] — Lee et al.'s keep-one
    * exact-substring dedup as a corpus rewrite: every k-token span
    * occurring ≥ 2 times corpus-wide keeps its globally FIRST
    * occurrence (ordered by doc_id, pos — deterministic) and every
    * other occurrence's token range is removed; a document's
    * clean_text is its surviving tokens re-joined (single-space
    * normalized, the same both engines). Documents shorter than k
    * tokens pass through whole.
    *
    * Returns (doc_id, n_tok, n_removed, clean_text), one row per doc.
    *
    * Because this DELETES text, span identity is decided on a
    * TWO-LANE 120-bit gram hash (two disjoint 60-bit slices of one
    * md5), not the single 60-bit lane the estimate-only operators use:
    * at the 100 TB target (~10^12 grams) a 60-bit space expects
    * tens of thousands of birthday collisions — each a silent 8-token
    * deletion of innocent text — while 120 bits put the chance of even
    * ONE collision corpus-wide at ~n²/2^121 ≈ 4·10⁻¹³. Both lanes
    * come from the md5 the scan already computes (no second digest),
    * and the oracle mirrors both lanes, so hash identity stays a
    * shared-algorithm property rather than a Spark implementation
    * detail.
    *
    * Scale shape: the duplicated-gram window and the removed-position
    * explode touch only the DUPLICATED subset (k rows per removable
    * span); the full-token explode + anti-join + re-agg is one
    * O(corpus tokens) shuffle keyed by doc — the same class as the
    * gram fan-out itself, and the price of producing rewritten text
    * at all. The gram fan-out itself is k-independent in row count
    * (one row per position regardless of span width); only the
    * constant per-row hash cost grows with k. */
  def stripSpans(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 8): DataFrame = {
    require(k >= 1, s"span width must be >= 1, got $k")
    val base = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tok"),
        col("tk"))
    val grams = base.filter(col("n_tok") >= k)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("tk")) - k),
          i => md5(concat_ws(" ", slice(col("tk"), i + 1, lit(k)))))))
      .select(col("doc_id"), col("pos"),
        conv(substring(col("col"), 1, 15), 16, 10).cast("long").as("h"),
        conv(substring(col("col"), 16, 15), 16, 10).cast("long").as("h2"))
    val removable = grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy("h", "h2")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("h", "h2").orderBy("doc_id", "pos")))
      .filter(col("c") >= 2 && col("rn") > 1)
    val removed = removable
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("p"))
      .distinct()
    val toks = base
      .select(col("doc_id"), posexplode(col("tk")))
      .select(col("doc_id"), col("pos").as("p"), col("col").as("tok"))
    val kept = toks.join(removed, Seq("doc_id", "p"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          st => st.getField("tok")), " ").as("clean_text"))
    base.select(col("doc_id"), col("n_tok"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** The STRUCTURE of a document's repetition, where [[spanStats]]
    * reports only its total: the duplicated positions' interval union
    * decomposed into maximal contiguous islands, reporting how many
    * there are and how long the longest run is. Distinguishes the two
    * failure modes a single coverage fraction conflates — one giant
    * boilerplate block (1 island, long: strip it and keep the doc) vs
    * repetition smeared through the text (many short islands: the doc
    * itself is template soup and should go). Same dup-position stage
    * as spanStats; the island decomposition is the standard
    * gaps-and-islands pass (break where a span starts past the running
    * max end, island id = running break count), integers throughout.
    *
    * Returns (doc_id, n_tok, n_islands, longest_island, dup_tok,
    * dup_frac) — one row per document, zero islands for clean docs. */
  def spanIslands(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 8): DataFrame = {
    require(k >= 1, s"span width must be >= 1, got $k")
    val base = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tok"),
        col("tk"))
    val grams = base.filter(col("n_tok") >= k)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("tk")) - k),
          i => TextFunctions.md5Hash60(
            concat_ws(" ", slice(col("tk"), i + 1, lit(k)))))))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
    val dup = grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("c") >= 2)
    val wRun = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + k).over(
      wRun.rowsBetween(Window.unboundedPreceding, -1))
    val islands = dup
      .withColumn("brk",
        when(col("pos") > coalesce(prevEnd, lit(Long.MinValue)), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy("doc_id", "island")
      .agg((max(col("pos")) + k - min(col("pos"))).cast("long").as("ilen"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_islands"),
        max(col("ilen")).as("longest_island"),
        sum(col("ilen")).as("dup_tok"))
    base.select(col("doc_id"), col("n_tok"))
      .join(islands, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        coalesce(col("longest_island"), lit(0L)).as("longest_island"),
        coalesce(col("dup_tok"), lit(0L)).as("dup_tok"),
        when(col("n_tok") === 0, lit(0.0))
          .otherwise(TextFunctions.portableRound(
            coalesce(col("dup_tok"), lit(0L)).cast("double") /
              col("n_tok"), 4))
          .as("dup_frac"))
  }
}
