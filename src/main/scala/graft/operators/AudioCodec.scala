package graft.operators

/** Real in-JVM WAV (RIFF / PCM) decoding for the multimodal pipeline —
  * the audio sibling of [[ImageCodec]].
  *
  * The JRE ships no compressed-audio codecs, but canonical WAV needs
  * none: the container is a RIFF chunk list and the samples are raw
  * little-endian PCM, so a header walk plus byte arithmetic is a REAL
  * decode, not a stub. Reference scope: the reference pipeline carries
  * no media columns at all (its tables are CSV/Postgres scalars —
  * `backend/app/main.py`, `ingest_capacity.py`); this is part of the
  * training-data extension surface.
  *
  * Robustness contract (same as ImageCodec): `decode` NEVER throws on
  * malformed payloads — sniff by magic bytes first, bound every chunk
  * body by the actual payload length so a forged 32-bit chunk size
  * cannot drive an out-of-bounds read or a multi-GB allocation, and
  * fall back (None) on anything that is not 16-bit integer PCM.
  *
  * Chunk-walk details that matter for real-world WAV:
  *   - chunks are word-aligned: an odd-sized body is followed by one
  *     pad byte (`sz & 1`) that is NOT part of the next chunk id;
  *   - `fmt ` may be longer than 16 bytes (WAVE_FORMAT_EXTENSIBLE
  *     appends cbSize + extension) — only the first 16 are read;
  *   - unknown chunks (LIST, fact, bext, …) are skipped, not errors.
  */
object AudioCodec {

  final case class Decoded(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, nFrames: Long,
                           durationMs: Double, rms: Double)

  /** Decode-size guard: reject data chunks above this many bytes
    * (128 MiB ≈ 64M samples) — a forged header must not stall an
    * executor core on one row. */
  val MaxDataBytes: Long = 128L * 1024 * 1024

  /** Magic-byte sniff — `RIFF....WAVE`, no parsing. */
  def sniff(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  /** Signed 16-bit LE sample. */
  private def s16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) | (b(i + 1) << 8)).toShort.toInt

  /** Decode a payload that sniffs as WAV; None for anything the sniff,
    * the size guards, or the PCM-16 requirement rejects (caller falls
    * back). Never throws on malformed payloads. RMS is over every
    * sample of every channel, in raw 16-bit units, rounded via the
    * engine-portable rule so thresholds compare across engines. */
  def decode(payload: Array[Byte]): Option[Decoded] = {
    if (!sniff(payload)) return None
    try {
      var off = 12
      var fmt = Option.empty[(Int, Int, Int, Int)] // format, ch, rate, bits
      var data = Option.empty[(Int, Int)]          // body offset, byte len
      while (off + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val szL = u32(payload, off + 4)
        val body = off + 8
        // forged/truncated chunk size → reject the whole payload: a
        // partial data chunk would silently change nFrames and rms
        if (szL < 0 || szL > Int.MaxValue || body + szL > payload.length)
          return None
        val sz = szL.toInt
        id match {
          case "fmt " if sz >= 16 && fmt.isEmpty =>
            fmt = Some((u16(payload, body), u16(payload, body + 2),
              u32(payload, body + 4).toInt, u16(payload, body + 14)))
          case "data" if data.isEmpty =>
            data = Some((body, sz))
          case _ => () // LIST/fact/bext/… — skipped, not errors
        }
        off = body + sz + (sz & 1) // word alignment pad byte
      }
      for {
        (format, ch, rate, bits) <- fmt
        (doff, dlen) <- data
        if format == 1 && bits == 16 && ch >= 1 && rate > 0 &&
          dlen <= MaxDataBytes
      } yield {
        val frameBytes = ch * 2
        val nFrames = dlen / frameBytes
        val nVals = nFrames * ch
        var i = 0
        var sumSq = 0.0 // int16² sums stay exact in double to 2^53
        while (i < nVals) {
          val s = s16(payload, doff + 2 * i).toDouble
          sumSq += s * s
          i += 1
        }
        val rms = if (nVals == 0) 0.0 else math.sqrt(sumSq / nVals)
        Decoded(rate, ch, 16, nFrames.toLong,
          graft.functions.TextFunctions
            .portableRoundJvm(nFrames * 1000.0 / rate, 4),
          graft.functions.TextFunctions.portableRoundJvm(rms, 4))
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Extract the interleaved 16-bit samples of a payload that
    * [[decode]] accepts, by the same guarded chunk walk — callers that
    * need the raw PCM (trim, resample, feature windows) must not
    * assume the 44-byte canonical layout, because real WAV may carry
    * LIST/fact chunks before `data`. Empty array when decode would
    * reject the payload. */
  def pcmSamples(payload: Array[Byte]): Array[Int] = {
    if (!sniff(payload)) return Array.emptyIntArray
    try {
      var off = 12
      var ok = false
      var doff = 0
      var dlen = 0
      while (off + 8 <= payload.length && !ok) {
        val id = new String(payload, off, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        val szL = u32(payload, off + 4)
        val body = off + 8
        if (szL < 0 || szL > Int.MaxValue || body + szL > payload.length)
          return Array.emptyIntArray
        val sz = szL.toInt
        if (id == "data") { doff = body; dlen = sz; ok = true }
        off = body + sz + (sz & 1)
      }
      if (!ok || dlen > MaxDataBytes) Array.emptyIntArray
      else Array.tabulate(dlen / 2)(i => s16(payload, doff + 2 * i))
    } catch {
      case scala.util.control.NonFatal(_) => Array.emptyIntArray
    }
  }

  /** Canonical 44-byte-header 16-bit PCM WAV encoder — the synthesis
    * side used by tests and by the hermetic payload builder. Interleaved
    * samples for multi-channel input. */
  def encodeWav(samples: Array[Short], sampleRate: Int,
                channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels channels")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }
}
