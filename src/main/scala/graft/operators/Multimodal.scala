package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted in batch over
  * partitions.
  *
  * The decode step is REAL for image payloads: PNG/BMP/GIF/JPEG are
  * decoded in-JVM via `javax.imageio` (ships with the JRE — no container
  * codec needed), yielding true width/height/band-count/mean-intensity.
  * Payloads that aren't a recognized image (e.g. the text-derived opaque
  * blobs the synthetic corpus carries) fall back to the documented
  * deterministic byte-stats path — bytes as 1-channel "pixels", metadata
  * from the typed struct — so the pipeline is total over mixed corpora.
  * Audio/video codecs are NOT in the JRE; those payloads take the
  * fallback path by design.
  *
  * The Spark-side shape is what matters at 100 TB: payload + metadata
  * struct (metadata readable without touching payload bytes — column
  * pruning), per-partition batch processing via `mapPartitions` (the
  * Scala analogue of `mapInPandas`: one iterator-batch per task,
  * amortizing decoder init).
  */
object Multimodal {

  /** Decoded feature row produced by the (stubbed) decoder. */
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 channels: Int, mean_intensity: Double)

  /** Attach a payload column (binary) + metadata struct to a documents
    * table — the canonical multimodal layout. In production the payload
    * is read from object storage; here it derives from text so tests are
    * hermetic. */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("image/fake").as("media_type"),
        // true BYTE count of the payload (the oracle mirrors bytes too
        // — encode(text) + unsigned hex-byte values — so multi-byte
        // UTF-8 documents hash-match; the Unicode edge docs prove it)
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        (pmod(length(col(textCol)), lit(64)) + lit(1)).cast("int").as("width"),
        (length(col(textCol)) / lit(64) + lit(1)).cast("int").as("height"))
        .as("meta"))

  /** Batch feature extraction over payloads. Real decode
    * ([[ImageCodec]]) for recognized image formats; deterministic
    * byte-stats fallback for opaque payloads (bytes as 1-channel
    * "pixels", mean intensity = mean byte value, metadata from the
    * typed struct). Runs per-partition so decoder state is initialized
    * once per task, not once per row. */
  def decodeFeatures(withPayloads: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    withPayloads.select("doc_id", "payload", "meta.media_type",
        "meta.n_bytes", "meta.width", "meta.height")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          ImageCodec.decode(payload) match {
            case Some(img) =>
              MediaFeatures(
                doc_id = r.getAs[Long]("doc_id"),
                media_type = img.mediaType,
                n_bytes = payload.length.toLong,
                width = img.width,
                height = img.height,
                channels = img.channels,
                mean_intensity = graft.functions.TextFunctions
                  .portableRoundJvm(img.meanIntensity, 4))
            case None =>
              val mean =
                if (payload.isEmpty) 0.0
                else payload.map(b => (b & 0xff).toDouble).sum / payload.length
              MediaFeatures(
                doc_id = r.getAs[Long]("doc_id"),
                media_type = r.getAs[String]("media_type"),
                n_bytes = r.getAs[Long]("n_bytes"),
                width = r.getAs[Int]("width"),
                height = r.getAs[Int]("height"),
                channels = 1,
                mean_intensity = graft.functions.TextFunctions
                  .portableRoundJvm(mean, 4))
          }
        }
      }
  }

  /** Resize stub — average-pooling the byte-"pixels" down to `outLen`
    * buckets (the deterministic stand-in for an image resize kernel).
    * Byte i lands in pool i·outLen/n — exactly outLen pools whenever
    * n ≥ outLen. One codegen'd pass per row ([[graft.plans.PooledBytes]];
    * output is fixed-size, so a per-row expression beats explode+agg),
    * producing a fixed-length intensity vector ready for the
    * embedding/ANN operators downstream. */
  def resizePooled(withPayloads: DataFrame, outLen: Int): DataFrame =
    withPayloads
      // zero-byte payloads have no pixels → absent from output, matching
      // the oracle's empty generate_series
      .filter(col("meta.n_bytes") > 0)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.bridge.column(
          graft.plans.PooledBytes(
            org.apache.spark.sql.graft.bridge.expression(col("payload")), outLen))
          .as("pooled"))

  /** Perceptual average-hash (aHash) over payload bytes — the
    * image-near-dup primitive: average-pool the byte stream into
    * `pools` buckets, set bit p iff pool p's mean exceeds the global
    * mean, and the resulting `pools`-bit integer survives small
    * payload perturbations (re-encode, minor edits) that break exact
    * byte hashes. On real images the pooling runs over decoded
    * luminance ([[ImageCodec]]); on opaque payloads the byte stream is
    * the 1-channel fallback, same as [[decodeFeatures]].
    *
    * Every comparison is EXACT integer math: bit p is
    * s_p·N > S·c_p (pool sum × total count vs total sum × pool count)
    * — no float mean ever exists, so any engine computes the same
    * hash. Scale shape: bytes explode per row (no shuffle), one
    * (doc, pool) hash agg, one per-doc agg. Zero-byte payloads are
    * absent (no pixels → no hash), the [[resizePooled]] contract. */
  def aHash(withPayloads: DataFrame, pools: Int = 32): DataFrame =
    withPayloads.filter(col("meta.n_bytes") > 0)
      .select(col("doc_id"),
        // one codegen'd O(n_bytes) pass per row ([[graft.plans
        // .AHashExpr]]) — the explode+agg formulation this replaces
        // pushed 2.5M (pos, byte) rows through two aggregations at
        // sf0.1 for the same exact-integer bits (4.7 s → scan-bound)
        org.apache.spark.sql.graft.bridge.column(
          graft.plans.AHashExpr(
            org.apache.spark.sql.graft.bridge.expression(col("payload")),
            pools)).as("phash"))
      .filter(col("phash") =!= lit(graft.plans.AHashExpr.Empty))

  /** Banded near-dup join over [[aHash]] values: candidates share one
    * of four 8-bit bands (the SimHash trick — hamming ≤ maxHamming
    * with bits spread over 4 bands guarantees one band is clean when
    * maxHamming < 4... and near-misses still collide with high
    * probability), verified by exact popcount(xor). Returns
    * (id_a, id_b, hamming). */
  def pHashPairs(hashes: DataFrame, maxHamming: Int = 6): DataFrame = {
    val spark = hashes.sparkSession
    import spark.implicits._
    val bandK = broadcast((0 until 4).toDF("k"))
    val bands = hashes.crossJoin(bandK)
      .select(col("doc_id"), col("phash"), col("k"),
        call_function("shiftright", col("phash"), (col("k") * 8).cast("int"))
          .bitwiseAND(lit(255L)).as("band"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.k") === col("b.k") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("a.phash").as("ha"),
        col("b.doc_id").as("id_b"), col("b.phash").as("hb"))
      .distinct()
    cand
      .select(col("id_a"), col("id_b"),
        call_function("bit_count",
          col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Frame-sampling shape for video-like payloads: every `stride`-th
    * byte-block becomes a "frame" row (explode with ordinal). Shows the
    * fan-out plumbing (one row → many frames) without a codec. */
  def sampleFrames(withPayloads: DataFrame, stride: Int): DataFrame =
    withPayloads
      .withColumn("_frames", expr(s"CAST(meta.n_bytes AS INT) DIV $stride"))
      // payloads shorter than one stride yield NO frames (an unguarded
      // sequence(0, -1) silently yields a DESCENDING [0, -1] and two
      // garbage frames)
      .filter(col("_frames") >= 1)
      .select(col("doc_id"), col("meta"),
        posexplode(expr(
          s"transform(sequence(0, _frames - 1, 1), " +
            s"i -> substring(CAST(payload AS STRING), i * $stride + 1, $stride))")))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_payload")
}
