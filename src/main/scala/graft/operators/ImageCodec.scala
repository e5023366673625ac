package graft.operators

/** Real in-JVM image decoding for the multimodal pipeline.
  *
  * PNG, BMP, GIF, and JPEG readers ship with the JRE (`javax.imageio`),
  * so decoding needs no container-level codec. Format detection is by
  * magic bytes FIRST — a reader is only attempted on payloads that
  * sniff as an image, so arbitrary binary/text payloads (the synthetic
  * corpus) never pay a failed-decode attempt and deterministically take
  * the caller's fallback path.
  *
  * Robustness contract (a corrupt payload must NEVER fail the Spark
  * task — it falls back): decode catches all non-fatal throwables, not
  * just IOException, because the JRE readers throw RuntimeExceptions
  * (ArrayIndexOutOfBounds, IllegalArgument, NegativeArraySize) on
  * truncated or forged bodies. Dimensions are read from the HEADER
  * (ImageReader.getWidth/getHeight — no pixel decode) and bounded by
  * `MaxPixels` before the full decode, so a forged header declaring
  * huge dimensions cannot drive a multi-GB allocation inside an
  * executor.
  *
  * Decoded stats come from the raster: `channels` is the true band
  * count (1 for grayscale, 3 RGB, 4 RGBA), and `meanIntensity` is the
  * mean over every sample of every band NORMALIZED to the 0–255 scale
  * (16-bit-per-sample PNGs divide by 257), so thresholds compare
  * across bit depths and against the byte-stats fallback path.
  */
object ImageCodec {

  final case class Decoded(mediaType: String, width: Int, height: Int,
                           channels: Int, meanIntensity: Double)

  /** Decode-size guard: reject images whose header declares more than
    * this many pixels (64 MPix ≈ 256 MB as 4-band int raster). */
  val MaxPixels: Long = 64L * 1024 * 1024

  // no tmp-file cache: executors shouldn't touch local disk per image
  javax.imageio.ImageIO.setUseCache(false)

  /** Magic-byte sniff — cheap, no decoder involved. */
  def sniff(b: Array[Byte]): Option[String] = {
    def at(i: Int, v: Int): Boolean = i < b.length && (b(i) & 0xff) == v
    if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G') &&
        at(4, 0x0d) && at(5, 0x0a) && at(6, 0x1a) && at(7, 0x0a))
      Some("image/png")
    else if (at(0, 'B') && at(1, 'M') && b.length >= 14)
      Some("image/bmp")
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8'))
      Some("image/gif")
    else if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff))
      Some("image/jpeg")
    else None
  }

  /** Decode a payload that sniffs as an image; None for anything the
    * sniff, the size guard, or the JRE reader rejects (caller falls
    * back). Never throws on malformed payloads. */
  def decode(payload: Array[Byte]): Option[Decoded] =
    sniff(payload).flatMap { mediaType =>
      try decodeChecked(payload, mediaType)
      catch {
        // JRE readers throw RuntimeExceptions (not just IOException) on
        // truncated/forged bodies — any such payload falls back
        case scala.util.control.NonFatal(_) => None
      }
    }

  private def decodeChecked(payload: Array[Byte],
                            mediaType: String): Option[Decoded] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          // header-only dimension read — guards the full-decode
          // allocation against forged headers
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) None
          else {
            val raster = reader.read(0).getRaster
            val bands = raster.getNumBands
            var sum = 0.0
            val rowBuf = new Array[Int](w)
            var band = 0
            while (band < bands) {
              // normalize this band's samples to 0–255 (8-bit: ÷1;
              // 16-bit: ÷257 — 65535/255)
              val maxVal = (1L << raster.getSampleModel.getSampleSize(band)) - 1
              val scale = 255.0 / maxVal.toDouble
              var y = 0
              while (y < h) {
                raster.getSamples(0, y, w, 1, band, rowBuf)
                var x = 0
                while (x < w) { sum += rowBuf(x) * scale; x += 1 }
                y += 1
              }
              band += 1
            }
            Some(Decoded(mediaType, w, h, bands,
              sum / (w.toLong * h * bands).toDouble))
          }
        } finally reader.dispose()
      }
    } finally if (iis != null) iis.close()
  }
}
