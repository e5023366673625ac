package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted in batch over
  * partitions.
  *
  * The media codecs themselves are NOT in this container, so the decode
  * step is a clearly-marked deterministic stub (`fakeDecode`) — but the
  * Spark-side plumbing is real and what matters at 100 TB: the schema
  * shape (payload + metadata struct), per-partition batch processing via
  * `mapPartitions` (the Scala analogue of `mapInPandas` — one
  * iterator-batch per task, amortizing decoder init), and
  * column-pruning-friendly layout (metadata readable without touching
  * payload bytes).
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
        // true BYTE count of the payload (== char count only for ASCII;
        // the test corpus is ASCII, which is what keeps the char-based
        // oracle SQL equivalent)
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        (pmod(length(col(textCol)), lit(64)) + lit(1)).cast("int").as("width"),
        (length(col(textCol)) / lit(64) + lit(1)).cast("int").as("height"))
        .as("meta"))

  /** STUB DECODER — deterministic fake standing in for an image decode
    * (`???` boundary: replace with a real codec off-container). Treats
    * payload bytes as 1-channel "pixels"; mean intensity = mean byte
    * value. Runs per-partition so a real decoder would init once per
    * task, not once per row. */
  def decodeFeatures(withPayloads: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    withPayloads.select("doc_id", "payload", "meta.media_type",
        "meta.n_bytes", "meta.width", "meta.height")
      .mapPartitions { rows =>
        // real impl: decoder = Codec.init() ONCE here, then map
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
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
            mean_intensity = graft.functions.TextFunctions.portableRoundJvm(mean, 4))
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
