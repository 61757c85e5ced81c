package graft.multimodal

/** Real binary image-header codec — pure-JVM byte-level parsing of
  * PNG and JPEG container structure (no native libraries), the
  * genuine decode step behind the multimodal column contract. The
  * matching encoder uses the JDK's own ImageIO so tests and q82
  * exercise the parser against bytes a real encoder produced.
  *
  * Scope: header metadata (dimensions, depth, color layout) plus PNG
  * IHDR CRC-32 validation — the fields a 100 TB media-ingest pass
  * extracts while leaving pixel decode to a pluggable codec
  * (Multimodal.decodeWith).
  */
object ImageCodec {

  /** Decoded header metadata. For PNG, `colorType` is the IHDR color
    * type (2 = truecolor) and `crcOk` validates the IHDR chunk's
    * CRC-32; for JPEG, `bitDepth` is the SOF sample precision,
    * `colorType` the component count, and `crcOk` is trivially true
    * (JPEG has no header checksum). */
  final case class ImageMeta(format: String, width: Int, height: Int,
                             bitDepth: Int, colorType: Int, crcOk: Boolean)

  private val PNG_SIG: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse a PNG IHDR chunk (big-endian fields, CRC-32 over
    * type+data, per the PNG spec's chunk layout). */
  def decodePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 33 || !b.take(8).sameElements(PNG_SIG)) return None
    def be32(off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    val len = be32(8)
    if (len != 13 || new String(b.slice(12, 16), "US-ASCII") != "IHDR") return None
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 4 + len) // chunk type + data
    Some(ImageMeta("png", be32(16), be32(20), b(24) & 0xff, b(25) & 0xff,
      crcOk = crc.getValue == (be32(16 + len).toLong & 0xffffffffL)))
  }

  /** Walk JPEG marker segments to the first SOFn (C0–CF except the
    * non-frame C4/C8/CC) and read precision/height/width/components. */
  def decodeJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      // the spec allows any number of 0xff FILL bytes before a marker
      // id — skip them, or a padded file reads a fill byte as the
      // marker and then a bogus segment length
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 3 >= b.length) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2 // standalone
      else {
        val segLen = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 9 >= b.length) return None
          val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
          val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
          return Some(ImageMeta("jpeg", w, h, b(i + 4) & 0xff, b(i + 9) & 0xff, crcOk = true))
        }
        if (marker == 0xda) return None // scan reached without a frame header
        i += 2 + segLen
      }
    }
    None
  }

  def decode(b: Array[Byte]): Option[ImageMeta] =
    decodePng(b).orElse(decodeJpeg(b))

  /** Deterministic tiny truecolor PNG through the JDK's real ImageIO
    * encoder (headless-safe): pixel (x,y) = a fixed function of
    * (x, y, seed), so the same (w, h, seed) always yields the same
    * bytes for the parser to read back. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 31L + y * 17L + seed) % 0x1000000L).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Same deterministic image through ImageIO's JPEG encoder (for the
    * SOF parser's spec — JPEG output bytes are encoder-version-
    * dependent, so only header fields are asserted, not hashes). */
  def encodeJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 31L + y * 17L + seed) % 0x1000000L).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }
}
