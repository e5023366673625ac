package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark-contamination detection: flag corpus documents that share
  * any word n-shingle with a held-out evaluation set — the standard
  * pre-training decontamination pass (GPT-3 appendix C uses 13-gram
  * spans; the shingle width is a parameter).
  *
  * Scale shape: the benchmark side is SMALL by construction (eval sets
  * are thousands of documents, the corpus is the 100 TB side), so its
  * distinct shingle set is BROADCAST and the corpus side is a scan →
  * explode → broadcast semi-join → per-doc count: no corpus shuffle at
  * all until the final per-doc aggregation of the (rare) hits.
  * Shingles ride as 60-bit md5 hashes, not strings — 8 bytes per
  * shingle through the join. */
object Contamination {

  /** (doc_id, n_contaminated) for every corpus doc sharing ≥1 distinct
    * word n-shingle with `bench` — docs with no overlap are absent
    * (the common case; left-join against the corpus to materialize a
    * full report). */
  def flag(corpus: DataFrame, idCol: String, textCol: String,
           bench: DataFrame, benchTextCol: String,
           shingleN: Int = 5): DataFrame = {
    // explode first, hash second (a generator cannot nest inside the
    // hash expression)
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), shingleN)).as("s"))
      .select(graft.functions.TextFunctions.md5Hash60(col("s")).as("h"))
      .distinct()
    corpus.select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(col(textCol), shingleN)).as("s"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.md5Hash60(col("s")).as("h"))
      .join(broadcast(benchGrams), Seq("h"), "left_semi")
      // shingles are distinct per doc (WordShingles), so count(*) is
      // the number of DISTINCT contaminated shingles
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Span-level decontamination: the TOKEN RANGES of each corpus doc
    * that overlap the benchmark — production pipelines redact the
    * contaminated span and keep the document, rather than dropping a
    * 10k-token page over one leaked test question. Defined over docs
    * with ≥ `shingleN` tokens (positional shingles need a full
    * window).
    *
    * Same access path as [[flag]] (scan → positional 60-bit shingle
    * hashes → broadcast semi-join, no corpus shuffle until the rare
    * hits), then one doc-keyed gaps-and-islands pass merges
    * overlapping/adjacent hit spans [pos, pos+n−1] into maximal
    * intervals — the [[RepeatedSpans]] recipe, emitting the intervals
    * themselves instead of their coverage. Output: (doc_id,
    * span_start, span_end, n_shingles) per contaminated span, token
    * indices inclusive. */
  def spans(corpus: DataFrame, idCol: String, textCol: String,
            bench: DataFrame, benchTextCol: String,
            shingleN: Int = 5): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), shingleN)).as("s"))
      .select(TextFunctions.md5Hash60(col("s")).as("h"))
      .distinct()
    val toks = corpus.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("tk"))
    val posGrams = toks.filter(size(col("tk")) >= shingleN)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("tk")) - shingleN),
          i => TextFunctions.md5Hash60(
            concat_ws(" ", slice(col("tk"), i + 1, lit(shingleN)))))))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
    val hits = posGrams.join(broadcast(benchGrams), Seq("h"), "left_semi")
    val wPrev = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("pos")
    hits
      // new island iff this span starts past the furthest previous
      // span end + 1 (overlap OR adjacency merges)
      .withColumn("brk", when(col("pos") >
        coalesce(max(col("pos") + (shingleN - 1)).over(wPrev), lit(-1)) + 1,
        1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + (shingleN - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_shingles"))
      .drop("island")
  }
}
