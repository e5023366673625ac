package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling, Similarity}

/** The training-data curation pipeline, end to end — the composition
  * every extension operator exists for:
  *
  *   documents → quality gate → language ID → near-dup cluster
  *   resolution (keepers only) → stratified sample by language →
  *   embeddings joined + int8-quantized → curated parquet
  *
  * Every stage is the oracle-checked library operator (x03, x04,
  * x16/x18/x27, x28, x26), so the pipeline's behavior is the already-
  * verified behavior — this job only composes and counts.
  *
  * Scale shape: stages 1–2 are codegen'd scan-time filters; dedup is
  * the blocked two-stage pipeline; sampling is a shuffle-free hash
  * gate; the embedding join is key-partitioned; quantization is a
  * write-time pass. Stage counts ride `observe` nodes that fire on the
  * actions the pipeline already runs (the dedup stage's eager cluster
  * resolution, then the final write) — no dedicated count() jobs.
  */
object CurationJob {

  final case class Counts(input: Long, quality: Long, keepers: Long,
                          sampled: Long, withEmbedding: Long)

  /** @param precomputedPairs verified near-dup pairs (id_a, id_b, …)
    *   over the quality-filtered corpus, if an earlier stage already
    *   produced them (e.g. a cached `Dedup.nearDupPipeline` run with the
    *   same thresholds over the same filtered docs) — the funnel then
    *   skips candidate generation entirely. Caller owns the equivalence;
    *   pairs from a different corpus or thresholds give wrong clusters. */
  def run(spark: SparkSession, docsPath: String, embeddingsPath: String,
          outPath: String, minQuality: Double = 0.3,
          rates: Map[String, Double] = Map("en" -> 0.8),
          defaultRate: Double = 0.5,
          precomputedPairs: Option[DataFrame] = None): Counts = {
    import org.apache.spark.sql.Observation
    val obsIn = new Observation("cur_in")
    val obsQ = new Observation("cur_quality")
    val obsK = new Observation("cur_keepers")
    val obsS = new Observation("cur_sampled")
    val obsE = new Observation("cur_emb")

    val docs = spark.read.parquet(docsPath)
      .observe(obsIn, count(lit(1)).as("n"))

    // 1. quality gate + language ID (scan-time, codegen'd). Cached:
    //    the dedup stage's candidate generation and the keeper join
    //    both re-consume it. The quality observation sits ABOVE the
    //    cache: whether metrics below a cache surface is SHAPE-DEPENDENT
    //    on Spark 4.1.2 (IngestJob's below-cache variant returned no
    //    metrics when the first action consumed a pruned in-memory
    //    scan; this job's obsIn — inside the cache build — does fire,
    //    verified by CurationJobSpec). Above-cache placement fires
    //    unconditionally, so the load-bearing counter lives there; the
    //    dedup stage consumes the observed variant, so its first eager
    //    action fires the quality count.
    val scored = docs
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
      .filter(col("quality") >= minQuality)
      .cache()
    val scoredObs = scored.observe(obsQ, count(lit(1)).as("n"))

    // 2. near-dup clusters over the quality-surviving docs; keep the
    //    canonical doc per cluster (the x27 shape)
    val keepers = Dedup.resolveClusters(scoredObs, "doc_id",
        precomputedPairs.getOrElse(
          Dedup.nearDupPipeline(scoredObs, "doc_id", "text",
            minEstJaccard = 0.25, minJaccard = 0.4)))
      .filter(col("keep")).select("doc_id")
    val deduped = scored.join(keepers, Seq("doc_id"))
      .observe(obsK, count(lit(1)).as("n"))

    // 3. curation mix: stratified deterministic sample by predicted lang
    val sampled = Sampling.stratifiedSample(deduped, "doc_id", "lang_pred",
        rates, defaultRate)
      .observe(obsS, count(lit(1)).as("n"))

    // 4. attach + quantize embeddings where present (left join: text-only
    //    docs stay, their vector columns null)
    val quantized = Similarity.quantizeInt8(
      spark.read.parquet(embeddingsPath), "vec_id", "embedding")
      .select(col("vec_id").as("doc_id"), col("scale"), col("codes"))
    val curated = sampled.join(quantized, Seq("doc_id"), "left")
      .observe(obsE, count(col("codes")).as("n"))

    // unpersist on every exit: a failed write must not leave the
    // quality-filtered corpus pinned for the session lifetime
    try curated.write.mode("overwrite").parquet(outPath)
    finally scored.unpersist()

    Counts(
      obsIn.get("n").asInstanceOf[Long],
      obsQ.get("n").asInstanceOf[Long],
      obsK.get("n").asInstanceOf[Long],
      obsS.get("n").asInstanceOf[Long],
      obsE.get("n").asInstanceOf[Long])
  }
}
