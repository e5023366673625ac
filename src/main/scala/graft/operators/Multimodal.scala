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

  /** Decoded audio row produced by [[decodeAudio]]. */
  final case class AudioFeatures(doc_id: Long, media_type: String,
                                 sample_rate: Int, n_samples: Long,
                                 duration_ms: Double, rms: Double)

  /** Attach a REAL WAV payload (RIFF header + 16-bit PCM mono) derived
    * deterministically from the document: sample count
    * `len(text) % 192 + 64`, 8 kHz, sample i =
    * `(doc_id·2654435761 + i·40503) mod 65536 − 32768`. Hermetic like
    * [[withPayload]], but the bytes are a VALID audio container, so the
    * decode side exercises a true chunk walk, not a fallback. The
    * sample recurrence is integer-exact in any engine (values < 2^48),
    * which is what lets a SQL oracle recompute the PCM without parsing
    * bytes — decode parity then proves encode∘decode = identity. */
  def withWavPayload(docs: DataFrame, idCol: String, textCol: String,
                     silencePrefixMod: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        (length(col(textCol)) % 192 + 64).cast("int").as("n"))
      .as[(Long, Int)]
      .mapPartitions { rows =>
        rows.map { case (docId, n) =>
          // optional planted leading silence (doc_id mod
          // silencePrefixMod zero samples) so trim operators have
          // something real to find; 0 = no silence (x169's layout)
          val pre =
            if (silencePrefixMod > 0) (docId % silencePrefixMod).toInt else 0
          val samples = Array.tabulate(n) { i =>
            if (i < pre) 0.toShort
            else ((docId * 2654435761L + i * 40503L) % 65536L - 32768L)
              .toShort
          }
          (docId, AudioCodec.encodeWav(samples, sampleRate = 8000))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Trimmed-audio row produced by [[trimSilence]]. */
  final case class TrimmedAudio(doc_id: Long, n_samples: Long,
                                lead_trimmed: Long, trail_trimmed: Long,
                                kept_samples: Long, kept_ms: Double,
                                rms_kept: Double)

  /** Leading/trailing silence trim over decoded PCM — the standard
    * speech-corpus preprocessing step (silence carries no training
    * signal but pays full storage/compute). A sample is "silence" when
    * |s| ≤ threshold; the kept region spans the first to the last
    * loud sample. All-silent payloads (and non-WAV payloads) report
    * kept 0 with the whole length as lead trim — total function, no
    * dropped rows. Per-partition batch decode like [[decodeAudio]];
    * integer comparisons pick the cut points, so the trim is
    * engine-exact, and only the kept-region RMS is float (portable-
    * rounded). */
  def trimSilence(withPayloads: DataFrame,
                  threshold: Int = 8192): Dataset[TrimmedAudio] = {
    implicit val enc = Encoders.product[TrimmedAudio]
    withPayloads.select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getAs[Long]("doc_id")
          val payload = r.getAs[Array[Byte]]("payload")
          AudioCodec.decode(payload) match {
            case Some(d) if d.channels == 1 && d.nFrames > 0 =>
              val n = d.nFrames.toInt
              // data chunk starts right after the 44-byte canonical
              // header ONLY for our own encoder's layout; re-walk the
              // chunks instead of assuming it
              val samples = AudioCodec.pcmSamples(payload)
              val first = samples.indexWhere(s => math.abs(s) > threshold)
              if (first < 0)
                TrimmedAudio(docId, n.toLong, n.toLong, 0L, 0L, 0.0, 0.0)
              else {
                val last =
                  samples.lastIndexWhere(s => math.abs(s) > threshold)
                val kept = last - first + 1
                var i = first
                var sumSq = 0.0
                while (i <= last) {
                  val s = samples(i).toDouble; sumSq += s * s; i += 1
                }
                TrimmedAudio(docId, n.toLong, first.toLong,
                  (n - 1 - last).toLong, kept.toLong,
                  graft.functions.TextFunctions
                    .portableRoundJvm(kept * 1000.0 / d.sampleRate, 4),
                  graft.functions.TextFunctions
                    .portableRoundJvm(math.sqrt(sumSq / kept), 4))
              }
            case _ =>
              TrimmedAudio(docId, 0L, 0L, 0L, 0L, 0.0, 0.0)
          }
        }
      }
  }

  /** Batch audio feature extraction: real RIFF/PCM decode
    * ([[AudioCodec]]) per payload, per-partition like
    * [[decodeFeatures]]. Payloads that don't decode as PCM-16 WAV get
    * the documented total-function fallback row (media_type "unknown",
    * zeros) rather than being dropped — at corpus scale a silently
    * vanishing row is a correctness bug, not a convenience. */
  def decodeAudio(withPayloads: DataFrame): Dataset[AudioFeatures] = {
    implicit val enc = Encoders.product[AudioFeatures]
    withPayloads.select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getAs[Long]("doc_id")
          AudioCodec.decode(r.getAs[Array[Byte]]("payload")) match {
            case Some(d) =>
              AudioFeatures(docId, "audio/wav", d.sampleRate,
                d.nFrames * d.channels, d.durationMs, d.rms)
            case None =>
              AudioFeatures(docId, "unknown", 0, 0L, 0.0, 0.0)
          }
        }
      }
  }

  /** Decimated-audio row produced by [[decimateAudio]]. */
  final case class DecimatedAudio(doc_id: Long, n_in: Long, n_out: Long,
                                  rate_out: Int, rms_out: Double)

  /** 2:1 audio decimation with a [1 2 1]/4 smoothing kernel — the
    * resample step a speech pipeline runs before a lower-rate model.
    * Output sample j is `(s[2j−1] + 2·s[2j] + s[2j+1]) / 4` with
    * edge clamping and TRUNCATING integer division, so the entire
    * kernel is integer-exact in any engine (both the JVM's `/` and
    * SQL integer division truncate toward zero); only the final RMS
    * is float, portable-rounded. Per-partition batch decode, total
    * over junk payloads, like every decoder here. */
  def decimateAudio(withPayloads: DataFrame): Dataset[DecimatedAudio] = {
    implicit val enc = Encoders.product[DecimatedAudio]
    withPayloads.select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getAs[Long]("doc_id")
          val payload = r.getAs[Array[Byte]]("payload")
          AudioCodec.decode(payload) match {
            case Some(d) if d.channels == 1 && d.nFrames > 0 =>
              val s = AudioCodec.pcmSamples(payload)
              val n = s.length
              val m = (n + 1) / 2
              var j = 0
              var sumSq = 0.0
              while (j < m) {
                val a = s(math.max(2 * j - 1, 0))
                val b = s(2 * j)
                val c = s(math.min(2 * j + 1, n - 1))
                val y = (a + 2 * b + c) / 4
                sumSq += y.toDouble * y
                j += 1
              }
              DecimatedAudio(docId, n.toLong, m.toLong, d.sampleRate / 2,
                graft.functions.TextFunctions
                  .portableRoundJvm(math.sqrt(sumSq / m), 4))
            case _ => DecimatedAudio(docId, 0L, 0L, 0, 0.0)
          }
        }
      }
  }

  /** Decoded PCM as an int array column — the bridge from the byte
    * world (RIFF payloads, JVM chunk walk) to the Column world: every
    * downstream DSP step over `samples` can then be a declarative
    * array expression that a SQL oracle mirrors 1:1 on the recurrence-
    * reconstructed PCM. Non-WAV payloads yield an empty array (total
    * function, like every decoder here). One codegen expression
    * ([[graft.plans.PcmSamples]]) — the typed Dataset.map it replaces
    * paid encoder ser/deser per row BETWEEN two codegen'd stages,
    * splitting the whole-stage span of every consumer (x179's
    * fingerprint chain is decode→landmarks→explode in one span now). */
  def pcmArray(withPayloads: DataFrame): DataFrame =
    withPayloads.select(col("doc_id"),
      org.apache.spark.sql.graft.bridge.column(
        graft.plans.PcmSamples(
          org.apache.spark.sql.graft.bridge.expression(col("payload"))))
        .as("samples"))

  /** Shazam-style audio landmark fingerprints over decoded PCM: frame
    * the samples into `frame`-sample windows, sum-of-squares energy
    * per frame (exact longs), keep STRICT local-maximum frames as
    * peaks, and hash every in-window peak pair
    * (band₁ | band₂ | Δframe | anchor-frame) where band = energy >> 8
    * (dropping low-order bits is the quantization; the remaining ~25
    * bits keep chance cross-track collisions negligible — a coarse
    * log-bucket band was measured at sf0.01 to produce ~160× more
    * chance pairs than true re-upload pairs). Including the anchor
    * position targets exact-copy detection (re-uploaded audio), the
    * dedup case; the shift-tolerant variant drops it and votes on
    * offsets downstream. Output: (doc_id, fh), 60-bit hash per
    * landmark.
    *
    * The whole extraction (energies → peaks → pair hashes) is ONE
    * codegen expression ([[graft.plans.AudioLandmarks]]) — one scan,
    * no shuffle; payload sizes bound the per-row work (n/frame frames,
    * ≤ that many peaks, ≤ fanout pairs per peak). The declarative
    * `transform`/`filter`/`aggregate` formulation it replaces ran
    * INTERPRETED per row (Spark HOF lambdas never enter whole-stage
    * codegen) and was measured at ~5× on this very scan —
    * MultimodalSpec pins the expression to that formulation's exact
    * output. */
  def audioLandmarks(pcm: DataFrame, frame: Int = 4,
                     fanout: Int = 8): DataFrame = {
    require(frame >= 1 && fanout >= 1, "frame and fanout must be >= 1")
    val lm = org.apache.spark.sql.graft.bridge.column(
      graft.plans.AudioLandmarks(
        org.apache.spark.sql.graft.bridge.expression(col("samples")),
        frame, fanout))
    pcm.select(col("doc_id"), explode(lm).as("fh"))
  }

  /** Cross-track fingerprint matching: hash-bucket join (the Shazam
    * lookup), count shared landmarks per track pair, keep pairs with
    * ≥ `minMatches`. `maxBucket` is the LSH valve (x06's lesson): a
    * degenerate hash shared by too many tracks would quadratically
    * blow the bucket self-join, so oversized buckets are DROPPED —
    * deterministically, both engines — and the cap is part of the
    * operator's contract, not a silent truncation (callers see the
    * cap; the default is far above anything non-degenerate). */
  def fingerprintMatches(landmarks: DataFrame, minMatches: Int = 8,
                         maxBucket: Int = 64): DataFrame = {
    val perBucket = landmarks.groupBy("fh")
      .agg(collect_set(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucket)
    perBucket
      .select(col("fh"), explode(col("ids")).as("id_a"))
      .join(perBucket.select(col("fh"), explode(col("ids")).as("id_b")),
        Seq("fh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_hashes"))
      .filter(col("n_hashes") >= minMatches)
      .orderBy("id_a", "id_b")
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
