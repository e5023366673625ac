package graft.operators

/** Real in-JVM image decoding for the multimodal pipeline.
  *
  * PNG, BMP, GIF, and JPEG readers ship with the JRE (`javax.imageio`),
  * so decoding needs no container-level codec. Format detection is by
  * magic bytes FIRST — `ImageIO.read` is only attempted on payloads that
  * sniff as an image, so arbitrary binary/text payloads (the synthetic
  * corpus) never pay a failed-decode attempt and deterministically take
  * the caller's fallback path.
  *
  * Decoded stats are computed from the raster, not the RGB-converted
  * view: `channels` is the true band count (1 for grayscale PNG, 3 for
  * RGB, 4 for RGBA), and `meanIntensity` is the mean of every sample of
  * every band (0–255), which is defined for any band layout.
  */
object ImageCodec {

  final case class Decoded(mediaType: String, width: Int, height: Int,
                           channels: Int, meanIntensity: Double)

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
    * sniff or the JRE reader rejects (caller falls back). */
  def decode(payload: Array[Byte]): Option[Decoded] =
    sniff(payload).flatMap { mediaType =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null) None
      else {
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val bands = raster.getNumBands
        var sum = 0.0
        val rowBuf = new Array[Int](w)
        var band = 0
        while (band < bands) {
          var y = 0
          while (y < h) {
            raster.getSamples(0, y, w, 1, band, rowBuf)
            var x = 0
            while (x < w) { sum += rowBuf(x); x += 1 }
            y += 1
          }
          band += 1
        }
        Some(Decoded(mediaType, w, h, bands,
          sum / (w.toLong * h * bands).toDouble))
      }
    }
}
