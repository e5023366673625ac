package graft.operators

import graft.SparkSpec

class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  test("encode → decode round-trips header fields and RMS exactly") {
    // 4 samples, known RMS: sqrt((3²+4²+0²+12²)/4) = sqrt(169/4) = 6.5
    val wav = AudioCodec.encodeWav(Array[Short](3, -4, 0, 12), 8000)
    val d = AudioCodec.decode(wav).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.bitsPerSample == 16)
    assert(d.nFrames == 4)
    assert(d.durationMs == 0.5) // 4 / 8000 s
    assert(d.rms == 6.5)
  }

  test("stereo: frames vs samples, RMS over every channel sample") {
    // 2 frames × 2 channels; RMS over all 4 values
    val wav = AudioCodec.encodeWav(Array[Short](1, -1, 1, -1), 16000,
      channels = 2)
    val d = AudioCodec.decode(wav).get
    assert(d.channels == 2 && d.nFrames == 2)
    assert(d.rms == 1.0)
    assert(d.durationMs == 0.125) // 2 frames / 16 kHz
  }

  test("unknown chunks are skipped and odd sizes are word-aligned") {
    // Hand-build: RIFF [LIST(3 bytes, padded)] [fmt ] [data] — a decoder
    // that forgets the pad byte misreads the next chunk id
    val base = AudioCodec.encodeWav(Array[Short](7, -7), 8000)
    val fmtAndData = base.drop(12)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // 3-byte body + pad
    val bb = java.nio.ByteBuffer
      .allocate(12 + list.length + fmtAndData.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + list.length + fmtAndData.length)
      .put("WAVE".getBytes("US-ASCII")).put(list).put(fmtAndData)
    val d = AudioCodec.decode(bb.array()).get
    assert(d.nFrames == 2 && d.rms == 7.0)
  }

  test("malformed payloads never throw: sniff, truncation, forged size, non-PCM") {
    assert(AudioCodec.decode("not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decode(Array.emptyByteArray).isEmpty)
    val good = AudioCodec.encodeWav(Array[Short](1, 2, 3, 4), 8000)
    // truncated mid-data
    assert(AudioCodec.decode(good.dropRight(3)).isEmpty)
    // forged data-chunk size pointing past the payload end
    val forged = good.clone()
    forged(43) = 0x7f // data size MSB → huge
    assert(AudioCodec.decode(forged).isEmpty)
    // non-PCM format code (e.g. 3 = IEEE float) → fallback
    val nonPcm = good.clone()
    nonPcm(20) = 3
    assert(AudioCodec.decode(nonPcm).isEmpty)
  }

  test("pcmSamples walks chunks; trimSilence cuts exactly the quiet edges") {
    // lead: 2 quiet, trail: 1 quiet, kept: |s| > 100 region of length 3
    val wav = AudioCodec.encodeWav(
      Array[Short](5, -100, 300, -400, 1200, 7), 8000)
    assert(AudioCodec.pcmSamples(wav).toSeq ==
      Seq(5, -100, 300, -400, 1200, 7))
    val df = Seq((1L, wav)).toDF("doc_id", "payload")
    val t = Multimodal.trimSilence(df, threshold = 100).head()
    assert(t.lead_trimmed == 2 && t.trail_trimmed == 1 &&
      t.kept_samples == 3)
    // kept RMS: sqrt((300² + 400² + 1200²)/3) = sqrt(1690000/3)
    assert(t.rms_kept ==
      graft.functions.TextFunctions.portableRoundJvm(
        math.sqrt(1690000.0 / 3), 4))
    // all-silent → kept 0, whole length reported as lead
    val quiet = Seq((2L, AudioCodec.encodeWav(Array[Short](1, -2, 3), 8000)))
      .toDF("doc_id", "payload")
    val tq = Multimodal.trimSilence(quiet, threshold = 100).head()
    assert(tq.kept_samples == 0 && tq.lead_trimmed == 3 &&
      tq.trail_trimmed == 0 && tq.rms_kept == 0.0)
    // junk payload → total-function zero row
    val junk = Seq((3L, "xx".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(Multimodal.trimSilence(junk).head().n_samples == 0L)
  }

  test("decimateAudio: [1 2 1]/4 taps, edge clamps, truncating division") {
    val wav = AudioCodec.encodeWav(Array[Short](5, -100, 300), 8000)
    val df = Seq((1L, wav)).toDF("doc_id", "payload")
    val d = Multimodal.decimateAudio(df).head()
    // j=0: (5 + 2·5 + (−100))/4 = −85/4 → −21 (toward zero)
    // j=1: ((−100) + 2·300 + 300)/4 = 800/4 = 200
    assert(d.n_in == 3 && d.n_out == 2 && d.rate_out == 4000)
    assert(d.rms_out == graft.functions.TextFunctions.portableRoundJvm(
      math.sqrt((21.0 * 21 + 200.0 * 200) / 2), 4))
    // junk payload → zero row, not a crash
    val junk = Seq((2L, "nope".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(Multimodal.decimateAudio(junk).head().n_out == 0L)
  }

  test("withWavPayload emits valid WAV; decodeAudio is total over junk") {
    val docs = Seq((7L, "hello world"), (8L, "")).toDF("doc_id", "text")
    val wp = Multimodal.withWavPayload(docs, "doc_id", "text")
    val rows = Multimodal.decodeAudio(wp).collect()
      .map(a => a.doc_id -> a).toMap
    // n = len % 192 + 64
    assert(rows(7L).n_samples == 75 && rows(8L).n_samples == 64)
    assert(rows(7L).media_type == "audio/wav" &&
      rows(7L).sample_rate == 8000)
    // sample 0 of doc 7: (7·2654435761 + 0) % 65536 − 32768
    val s0 = (7L * 2654435761L) % 65536L - 32768L
    val payload = wp.filter($"doc_id" === 7L)
      .select("payload").as[Array[Byte]].head()
    val v0 = ((payload(44) & 0xff) | (payload(45) << 8)).toShort.toInt
    assert(v0 == s0)
    // junk payload → fallback row, not a dropped row or a crash
    val junk = Seq((9L, "zzz".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val f = Multimodal.decodeAudio(junk).collect()
    assert(f.length == 1 && f.head.media_type == "unknown" &&
      f.head.n_samples == 0L)
  }
}
