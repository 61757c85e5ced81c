package graft.multimodal

/** Real binary audio-header codec — pure-JVM byte-level parsing of
  * the WAV/RIFF container (no native libraries), the audio sibling of
  * [[ImageCodec]]. The matching encoder uses the JDK's own
  * javax.sound.sampled writer, so tests and q104 exercise the parser
  * against bytes a real encoder produced — an endianness, chunk-walk,
  * or padding bug breaks the oracle hash, not just a unit fixture.
  *
  * Scope: format metadata (PCM code, channels, sample rate, bit
  * depth, sample count) plus RIFF size-consistency validation — the
  * fields a 100 TB media-ingest pass extracts while leaving sample
  * decode to a pluggable codec (Multimodal.decodeWith).
  */
object AudioCodec {

  /** Decoded WAV metadata. `nSamples` counts sample FRAMES
    * (dataBytes / (channels × bits/8)); `sizeOk` validates that the
    * RIFF declared size matches the file length (the container's only
    * integrity field — WAV has no checksum). */
  final case class WavMeta(format: String, audioFormat: Int, channels: Int,
                           sampleRateHz: Int, bitsPerSample: Int,
                           nSamples: Long, sizeOk: Boolean)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b.slice(off, off + 4), "US-ASCII")

  /** Walk the RIFF chunk list: 'fmt ' yields the format block, 'data'
    * the payload size. Chunks are word-aligned — an odd-sized chunk is
    * followed by one pad byte (the classic parser bug this codec gets
    * right; cf. the JPEG fill-byte lesson in ImageCodec). */
  def decodeWav(b: Array[Byte]): Option[WavMeta] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    val riffSize = le32(b, 4)
    // offsets advance in LONG: a crafted 32-bit chunk size truncated
    // to Int can go non-positive and freeze the walk; in Long the
    // step is always >= 8, so malformed sizes run off the end and
    // fall out of the loop instead
    var off = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // audioFormat, channels, rate, bits
    var dataBytes = -1L
    while (off + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val o = off.toInt
      val id = tag(b, o)
      val size = le32(b, o + 4)
      if (id == "fmt " && size >= 16 && off + 8 + 16 <= b.length)
        fmt = Some((le16(b, o + 8), le16(b, o + 10),
          le32(b, o + 12).toInt, le16(b, o + 22)))
      else if (id == "data")
        dataBytes = size
      // advance past the chunk + its word-alignment pad byte
      off += 8L + size + (size & 1L)
    }
    fmt match {
      case Some((af, ch, rate, bits)) if dataBytes >= 0 && ch > 0 && bits > 0 =>
        val bytesPerFrame = ch.toLong * (bits / 8)
        Some(WavMeta("wav", af, ch, rate, bits,
          if (bytesPerFrame > 0) dataBytes / bytesPerFrame else -1L,
          sizeOk = riffSize == b.length - 8))
      case _ => None
    }
  }

  /** The 16-bit PCM payload of a WAV as interleaved samples — the
    * data-chunk twin of decodeWav's metadata walk (same RIFF
    * traversal, same word-alignment rule), little-endian int16 per
    * the format. None for non-RIFF bytes, non-PCM, or non-16-bit
    * audio — per-row error isolation, not a task failure. */
  def pcmSamples16(b: Array[Byte]): Option[Array[Short]] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12L
    var af = -1
    var bits = -1
    var dataOff = -1L
    var dataBytes = -1L
    while (off + 8 <= b.length && (bits < 0 || dataOff < 0)) {
      val o = off.toInt
      val id = tag(b, o)
      val size = le32(b, o + 4)
      if (id == "fmt " && size >= 16 && off + 8 + 16 <= b.length) {
        af = le16(b, o + 8)
        bits = le16(b, o + 22)
      } else if (id == "data") { dataOff = off + 8; dataBytes = size }
      off += 8L + size + (size & 1L)
    }
    // af == 1 is WAVE_FORMAT_PCM — a compressed codec declaring 16
    // bits/sample (or 0xFFFE extensible) must NOT be reinterpreted as
    // int16 samples; it drops per-row like any malformed payload
    if (af != 1 || bits != 16 || dataOff < 0 || dataOff + dataBytes > b.length) return None
    val n = (dataBytes / 2).toInt
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = le16(b, (dataOff + 2L * i).toInt).toShort
      i += 1
    }
    Some(out)
  }

  /** Encode a deterministic PCM WAV through the JDK's own writer
    * (javax.sound.sampled) — a REAL encoder, same philosophy as
    * ImageCodec.encodePng via ImageIO. Samples are a fixed sawtooth
    * of the id (content never reaches the metadata oracle; determinism
    * keeps re-runs byte-identical). */
  def encodeWav(channels: Int, sampleRateHz: Int, nSamples: Int, seed: Long): Array[Byte] =
    encodeWavSamples(channels, sampleRateHz,
      Array.tabulate(nSamples * channels)(i =>
        (((seed + i * 2654435761L) % 4096) - 2048).toShort))

  /** Encode GIVEN int16 samples (interleaved if multi-channel) through
    * the JDK's own WAV writer — the general API under the sawtooth
    * generator above. Callers that need a DIFFERENT closed-form
    * signal (the fingerprint corpus needs a well-mixed one: the
    * sawtooth's low-12-bit stride makes every frame an arithmetic
    * progression and fingerprints correlate across seeds) synthesize
    * their own samples and still get real RIFF bytes for the
    * decoder. */
  def encodeWavSamples(channels: Int, sampleRateHz: Int,
                       samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val bits = 16
    val nSamples = samples.length / channels
    val pcm = new Array[Byte](samples.length * (bits / 8))
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      pcm(2 * i) = (v & 0xff).toByte          // little-endian per frame
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRateHz.toFloat, bits, channels,
      /* signed = */ true, /* bigEndian = */ false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
