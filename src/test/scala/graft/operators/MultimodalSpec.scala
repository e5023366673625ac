package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "abc"), (2L, "A longer payload simulating an image blob")
  ).toDF("doc_id", "text")

  test("payload + metadata layout and deterministic stub decode") {
    val withP = Multimodal.withPayload(docs, "doc_id", "text")
    assert(withP.schema("payload").dataType.typeName == "binary")
    val f = Multimodal.decodeFeatures(withP).collect()
      .map(m => m.doc_id -> m).toMap
    assert(f(1L).n_bytes == 3 && f(1L).width == 4 && f(1L).channels == 1)
    // "abc" → (97+98+99)/3 = 98.0
    assert(f(1L).mean_intensity == 98.0)
    // deterministic across runs
    val again = Multimodal.decodeFeatures(withP).collect()
      .map(m => m.doc_id -> m.mean_intensity).toMap
    assert(again(2L) == f(2L).mean_intensity)
  }

  private def rgbPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def grayPng(w: Int, h: Int, level: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, level)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG payloads decode to true pixel stats via javax.imageio") {
    val rgb = rgbPng(5, 3, 10, 20, 30)   // 3 bands, mean (10+20+30)/3
    val gray = grayPng(4, 4, 200)        // 1 band, every sample 200
    val mixed = Seq(
      (1L, rgb), (2L, gray),
      (3L, "not an image at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select($"doc_id", $"payload",
        struct(lit("application/octet-stream").as("media_type"),
          length($"payload").cast("long").as("n_bytes"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    val f = Multimodal.decodeFeatures(mixed).collect()
      .map(m => m.doc_id -> m).toMap
    // real decode: true dimensions, band count, per-sample mean
    assert(f(1L).media_type == "image/png")
    assert(f(1L).width == 5 && f(1L).height == 3 && f(1L).channels == 3)
    assert(f(1L).mean_intensity == 20.0)
    assert(f(1L).n_bytes == rgb.length)
    assert(f(2L).media_type == "image/png")
    assert(f(2L).width == 4 && f(2L).height == 4 && f(2L).channels == 1)
    assert(f(2L).mean_intensity == 200.0)
    // non-image payloads take the deterministic byte-stats fallback
    assert(f(3L).media_type == "application/octet-stream")
    assert(f(3L).channels == 1 && f(3L).width == 0)
  }

  test("ImageCodec sniffs magic bytes before ever invoking a reader") {
    assert(ImageCodec.sniff(rgbPng(2, 2, 0, 0, 0)).contains("image/png"))
    assert(ImageCodec.sniff("plain text".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.sniff(Array.emptyByteArray).isEmpty)
    // a PNG magic prefix with garbage body: sniffed, but decode rejects
    val corrupt = rgbPng(2, 2, 0, 0, 0).take(12)
    assert(ImageCodec.sniff(corrupt).contains("image/png"))
    assert(ImageCodec.decode(corrupt).isEmpty)
  }

  test("forged giant-dimension header is rejected before allocation") {
    // patch the IHDR width field (bytes 16-19, big-endian) of a real
    // PNG to 2^30: the header-only size guard must bail without
    // attempting the multi-GB decode
    val forged = rgbPng(2, 2, 0, 0, 0).clone()
    forged(16) = 0x40.toByte; forged(17) = 0; forged(18) = 0; forged(19) = 0
    assert(ImageCodec.decode(forged).isEmpty)
    // and a corrupt body after a VALID header falls back, never throws
    val truncated = rgbPng(8, 8, 10, 20, 30).take(40)
    assert(ImageCodec.decode(truncated).isEmpty)
  }

  test("frame sampling fans one payload into ordered frame rows") {
    val frames = Multimodal.sampleFrames(
      Multimodal.withPayload(docs, "doc_id", "text"), stride = 10)
      .filter($"doc_id" === 2L)
    val n = frames.count()
    assert(n == 4) // 42 bytes / 10 → 4 full frames
    assert(frames.agg(max("frame_no")).head().getInt(0) == 3)
  }

  test("aHash: identical payloads share a hash; a small edit stays " +
    "within hamming reach; unrelated payloads do not pair") {
    import spark.implicits._
    val loud = "A".repeat(40) + "z".repeat(40)
    val docs = Seq(
      (1L, loud),
      (2L, loud), // exact copy
      (3L, "A".repeat(40) + "z".repeat(38) + "zy"), // 1-char swap
      (4L, "qW3$ 9pL x" + "m".repeat(10) + "QQQQ" + "  tail here 123")
    ).toDF("doc_id", "text")
    val hashes = Multimodal.aHash(
      Multimodal.withPayload(docs, "doc_id", "text"))
    val h = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    val pairs = Multimodal.pHashPairs(hashes, maxHamming = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
      .toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(pairs.contains((1L, 3L)), s"near edit must pair: $pairs")
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L },
      s"unrelated payload paired: $pairs")
  }

  test("aHash: empty payloads are absent; multi-byte UTF-8 hashes over " +
    "BYTES (layout-independent)") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "héllo wörld é" * 3), (3L, "plain"))
      .toDF("doc_id", "text")
    val hashes = Multimodal.aHash(
      Multimodal.withPayload(docs, "doc_id", "text"))
    val ids = hashes.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 3L)) // empty payload yields no hash
    val again = Multimodal.aHash(
      Multimodal.withPayload(docs.repartition(5), "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == again)
  }

  test("audio fingerprints: a byte-identical copy matches on EVERY " +
    "landmark; unrelated tracks share none at fine bands") {
    val docs = Seq((1L, "x" * 100), (2L, "y" * 137), (3L, "z" * 60))
      .toDF("doc_id", "text")
    val pcm = Multimodal.pcmArray(
      Multimodal.withWavPayload(docs, "doc_id", "text"))
    val withCopy = pcm.unionByName(pcm.filter(col("doc_id") === 1L)
      .select((-col("doc_id")).as("doc_id"), col("samples")))
    val lm = Multimodal.audioLandmarks(withCopy)
    val perDoc = lm.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc(1L) == perDoc(-1L)) // identical constellation
    val matches = Multimodal.fingerprintMatches(lm, minMatches = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(matches.keySet == Set((-1L, 1L)))
    assert(matches((-1L, 1L)) == perDoc(1L))
  }

  test("audio fingerprints: the bucket valve drops oversized buckets " +
    "instead of self-joining them") {
    val spark2 = spark
    import spark2.implicits._
    // 10 tracks all emitting the SAME single hash: bucket size 10
    val lm = (1 to 10).map(i => (i.toLong, 42L)).toDF("doc_id", "fh")
    val capped = Multimodal.fingerprintMatches(lm, minMatches = 1,
      maxBucket = 5)
    assert(capped.count() == 0) // valve dropped the degenerate bucket
    val open = Multimodal.fingerprintMatches(lm, minMatches = 1,
      maxBucket = 64)
    assert(open.count() == 45) // C(10,2) when the cap allows it
  }

  test("audio fingerprints: non-WAV payloads produce no landmarks, " +
    "not a crash") {
    val junk = Seq((7L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    assert(Multimodal.audioLandmarks(Multimodal.pcmArray(junk))
      .count() == 0)
  }

  test("audio landmarks: the codegen expression reproduces the " +
    "interpreted HOF formulation exactly (including short-track edges)") {
    // lengths straddle every edge: empty, < one frame, < 3 frames
    // (no interior peak possible), and long-enough real constellations
    val docs = Seq((1L, "x" * 100), (2L, "y" * 137), (3L, "z" * 60),
      (4L, "ab"), (5L, ""), (6L, "short frame" * 2))
      .toDF("doc_id", "text")
    val pcm = Multimodal.pcmArray(
      Multimodal.withWavPayload(docs, "doc_id", "text"))
      .localCheckpoint()
    val frame = 4
    val fanout = 8
    // the pre-r14 Column-algebra formulation, verbatim — the semantic
    // pin the codegen expression must match hash-for-hash
    val nf = (size(col("samples")) / frame).cast("int")
    val energies = when(nf >= 1,
      transform(sequence(lit(0), nf - 1),
        f => aggregate(slice(col("samples"), f * frame + 1, lit(frame)),
          lit(0L), (acc, x) =>
            acc + x.cast("long") * x.cast("long"))))
      .otherwise(array().cast("array<bigint>"))
    val withE = pcm.select(col("doc_id"), energies.as("es"))
    val peaks = when(size(col("es")) >= 3,
      filter(sequence(lit(1), size(col("es")) - 2),
        p => element_at(col("es"), p + 1) > element_at(col("es"), p) &&
          element_at(col("es"), p + 1) > element_at(col("es"), p + 2)))
      .otherwise(array().cast("array<int>"))
    val withP = withE.select(col("doc_id"), col("es"), peaks.as("pk"))
    def band(p: org.apache.spark.sql.Column) =
      shiftright(element_at(col("es"), p + 1), 8).cast("long")
    val pairs = flatten(transform(col("pk"), p1 =>
      transform(filter(col("pk"), p2 => p2 > p1 && p2 - p1 <= fanout),
        p2 => graft.functions.TextFunctions.md5Hash60(
          concat_ws("|", band(p1).cast("string"), band(p2).cast("string"),
            (p2 - p1).cast("long").cast("string"),
            p1.cast("long").cast("string"))))))
    val legacy = withP.select(col("doc_id"), explode(pairs).as("fh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val codegen = Multimodal.audioLandmarks(pcm, frame, fanout)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(legacy.nonEmpty, "the pin needs real landmarks to compare")
    assert(codegen == legacy)
  }
}
