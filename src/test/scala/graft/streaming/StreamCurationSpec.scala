package graft.streaming

import graft.SparkSpec
import graft.pipeline.CurationJob
import org.apache.spark.sql.functions._

class StreamCurationSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** (doc_id, quality, lang_pred, has_embedding) fingerprint of a
    * curated table — the full row identity the convergence claim is
    * about. */
  private def fingerprint(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("quality"), col("lang_pred"),
        col("codes").isNotNull.as("has_emb"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getBoolean(3))).toSet

  /** Batch-pipeline output over `docsPath` with the spec's parameters. */
  private def batchCurated(docsPath: String): org.apache.spark.sql.DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-scb").toString
    CurationJob.run(spark, docsPath, s"$sfDir/embeddings.parquet",
      s"$out/curated", minQuality = 0.3,
      rates = Map("en" -> 0.8), defaultRate = 0.5)
    spark.read.parquet(s"$out/curated")
  }

  private def arrive(work: String, df: org.apache.spark.sql.DataFrame,
                     name: String): Unit = {
    val stage = s"$work/stage-$name"
    df.coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$work/in/$name"))
  }

  test("incremental curation converges to the batch pipeline, including " +
    "across a checkpoint restart mid-stream") {
    val work = java.nio.file.Files.createTempDirectory("graft-scur").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$work/in"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val schema = docs.schema

    // batch 1 arrives; first drain
    arrive(work, docs.filter(col("doc_id") % 3 === 0), "f1.parquet")
    StreamCuration.curateAvailableNow(spark, s"$work/in", schema,
      s"$work/cur", s"$sfDir/embeddings.parquet", s"$work/cp")
    // mid-stream convergence: curated == batch pipeline on batch 1 alone
    val b1Path = s"$work/b1docs"
    docs.filter(col("doc_id") % 3 === 0).write.parquet(b1Path)
    assert(fingerprint(StreamCuration.readCurated(spark, s"$work/cur")) ==
      fingerprint(batchCurated(b1Path)),
      "after one batch, curated must equal the batch run on that prefix")

    // the stream is DOWN (AvailableNow terminated = the restart gap);
    // two more batches arrive, then a drain from the SAME checkpoint
    arrive(work, docs.filter(col("doc_id") % 3 === 1), "f2.parquet")
    arrive(work, docs.filter(col("doc_id") % 3 === 2), "f3.parquet")
    StreamCuration.curateAvailableNow(spark, s"$work/in", schema,
      s"$work/cur", s"$sfDir/embeddings.parquet", s"$work/cp")

    val streamed = StreamCuration.readCurated(spark, s"$work/cur")
    val batch = batchCurated(s"$sfDir/documents.parquet")
    assert(fingerprint(streamed) == fingerprint(batch),
      "after the full stream, curated must equal the from-scratch batch run")
    assert(streamed.count() > 0)
    // docs store accumulated exactly the quality survivors; the restart
    // did not double-merge batch 1 (doc_id is the upsert key, and the
    // signature store holds one row per shingled survivor)
    val nDocs = graft.operators.MergeUpsert
      .readPlain(spark, StreamCuration.docsPath(s"$work/cur")).count()
    val nSurvivors = docs
      .filter(graft.functions.TextFunctions
        .qualityScore(col("text")) >= 0.3).count()
    assert(nDocs == nSurvivors)
  }

  test("publishEvery-N cadence skips mid-cadence publishes but converges " +
    "to the publishEvery-1 table, including across a restart mid-cadence") {
    val work = java.nio.file.Files.createTempDirectory("graft-scurN").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$work/in"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val schema = docs.schema

    // accumulate-only step never creates/advances the curated table
    val direct = s"$work/direct"
    StreamCuration.publishQuantizedEmbeddings(spark, direct,
      s"$sfDir/embeddings.parquet")
    StreamCuration.curateBatch(spark, docs.filter(col("doc_id") % 3 === 0),
      direct, minQuality = 0.3, rates = Map("en" -> 0.8), defaultRate = 0.5,
      publish = false)
    assert(!new java.io.File(StreamCuration.curatedPath(direct)).exists(),
      "publish=false must not write the curated table")
    // ...and the deferred publish is a pure function of the stores
    StreamCuration.republishCurated(spark, direct, Map("en" -> 0.8), 0.5)
    assert(new java.io.File(StreamCuration.curatedPath(direct)).exists())

    // streamed with publishEvery=2 over three batches, with a restart
    // after batch 1 — i.e. mid-cadence (batchId 0 has not published)
    arrive(work, docs.filter(col("doc_id") % 3 === 0), "f1.parquet")
    StreamCuration.curateAvailableNow(spark, s"$work/in", schema,
      s"$work/cur", s"$sfDir/embeddings.parquet", s"$work/cp",
      publishEvery = 2)
    // the drain-end convergence republish covers the mid-cadence stop
    val b1Path = s"$work/b1docs"
    docs.filter(col("doc_id") % 3 === 0).write.parquet(b1Path)
    assert(fingerprint(StreamCuration.readCurated(spark, s"$work/cur")) ==
      fingerprint(batchCurated(b1Path)),
      "drain ending mid-cadence must still converge the curated table")

    arrive(work, docs.filter(col("doc_id") % 3 === 1), "f2.parquet")
    arrive(work, docs.filter(col("doc_id") % 3 === 2), "f3.parquet")
    StreamCuration.curateAvailableNow(spark, s"$work/in", schema,
      s"$work/cur", s"$sfDir/embeddings.parquet", s"$work/cp",
      publishEvery = 2)

    // publishEvery ∈ {1, N} final-state equality: N-cadence == batch run
    val streamed = StreamCuration.readCurated(spark, s"$work/cur")
    assert(fingerprint(streamed) ==
      fingerprint(batchCurated(s"$sfDir/documents.parquet")),
      "publishEvery=N must converge to the same final curated table")
  }

  test("curateBatch surfaces a BACKGROUND store-merge failure as the " +
    "batch's failure (the durability barrier), never silently") {
    val work = java.nio.file.Files
      .createTempDirectory("graft-scur-fail").toString + "/cur"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(work))
    // the docs-store path pre-exists as a FILE: the background docs
    // merge cannot create its version dir and must fail — and that
    // failure must reach the caller through the Await barrier (a
    // foreachBatch that swallowed it would checkpoint a batch whose
    // state never landed)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(StreamCuration.docsPath(work)))
    StreamCuration.publishQuantized(spark, work,
      graft.operators.Similarity.quantizeInt8(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    intercept[Exception] {
      StreamCuration.curateBatch(spark, docs, work,
        minQuality = 0.3, rates = Map("en" -> 0.8), defaultRate = 0.5)
    }
  }

  test("curateBatch: an empty micro-batch is a no-op that leaves the " +
    "stores and the curated table converged") {
    val work = java.nio.file.Files
      .createTempDirectory("graft-scur-empty").toString + "/cur"
    StreamCuration.publishQuantized(spark, work,
      graft.operators.Similarity.quantizeInt8(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    StreamCuration.curateBatch(spark, docs, work,
      minQuality = 0.3, rates = Map("en" -> 0.8), defaultRate = 0.5)
    val before = fingerprint(StreamCuration.readCurated(spark, work))
    // zero-row batch (a trigger with no new files): every store merge
    // is a keyed no-op and the republish converges to the same table
    StreamCuration.curateBatch(spark, docs.filter(lit(false)), work,
      minQuality = 0.3, rates = Map("en" -> 0.8), defaultRate = 0.5)
    assert(fingerprint(StreamCuration.readCurated(spark, work)) == before,
      "an empty batch must not move the curated table")
  }
}
