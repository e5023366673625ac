package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
