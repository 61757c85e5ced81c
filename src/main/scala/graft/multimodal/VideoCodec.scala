package graft.multimodal

/** Real binary video-container codec — pure-JVM byte-level parsing of
  * the ISO-BMFF (MP4) box structure, the video sibling of
  * [[ImageCodec]] / [[AudioCodec]]. Scope: container metadata — major
  * brand from `ftyp`, timescale/duration from `moov`→`mvhd` (both the
  * version-0 32-bit and version-1 64-bit layouts), with whole-file
  * size validation — the fields a 100 TB media-ingest pass extracts
  * while leaving sample decode to a pluggable codec.
  *
  * Parsing pitfalls this gets right (each covered by CodecSpec):
  * big-endian sizes (RIFF is little-endian — the classic cross-codec
  * bug), the `size == 1` 64-bit largesize escape, nested box
  * traversal (mvhd sits INSIDE moov, possibly after sibling boxes),
  * and version-dependent field offsets (v1 widens the two timestamps
  * to 8 bytes, shifting timescale from +20 to +28). Unlike
  * ImageCodec/AudioCodec the JDK ships no MP4 writer, so the test
  * encoder below is hand-rolled to the published box layout — still
  * real bytes, but writer and parser share authorship; the layout
  * constants are the ISO 14496-12 ones.
  */
object VideoCodec {

  /** Decoded MP4 metadata. `durationMs` = durationTicks·1000 /
    * timescale in INTEGER arithmetic (engine-portable — the q111
    * oracle recomputes it with `//`). `sizeOk` validates that the
    * top-level boxes exactly tile the file. */
  final case class Mp4Meta(format: String, brand: String, timescale: Long,
                           durationTicks: Long, durationMs: Long, sizeOk: Boolean)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b.slice(off, off + 4), "US-ASCII")

  /** Walk the sibling boxes of [start, end): invoke f(type, payloadOff,
    * payloadEnd) per box; returns whether the boxes exactly tile the
    * range. Sizes advance in Long (a crafted 32-bit size can't wedge
    * the walk — AudioCodec's lesson). */
  private def walk(b: Array[Byte], start: Long, end: Long)
                  (f: (String, Long, Long) => Unit): Boolean = {
    var off = start
    while (off + 8 <= end) {
      val o = off.toInt
      val size32 = be32(b, o)
      val typ = tag(b, o + 4)
      // size==1 → 64-bit largesize follows the type; size==0 → box
      // extends to end of enclosing container
      val (size, hdr) =
        if (size32 == 1L && off + 16 <= end) (be64(b, o + 8), 16L)
        else if (size32 == 0L) (end - off, 8L)
        else (size32, 8L)
      if (size < hdr || off + size > end) return false
      f(typ, off + hdr, off + size)
      off += size
    }
    off == end
  }

  /** Parse brand + mvhd timescale/duration from an MP4. None for
    * non-BMFF bytes or a missing ftyp/moov/mvhd — per-row error
    * isolation, never a throw (CodecSpec fuzzes totality). */
  def decodeMp4(b: Array[Byte]): Option[Mp4Meta] = {
    if (b.length < 16 || tag(b, 4) != "ftyp") return None
    var brand: Option[String] = None
    var ts = -1L
    var dur = -1L
    val tiled = walk(b, 0L, b.length.toLong) { (typ, po, pe) =>
      if (typ == "ftyp" && pe - po >= 4 && brand.isEmpty)
        brand = Some(tag(b, po.toInt))
      else if (typ == "moov")
        walk(b, po, pe) { (ct, co, ce) =>
          if (ct == "mvhd" && ts < 0 && ce - co >= 4) {
            val version = b(co.toInt) & 0xff
            if (version == 1 && ce - co >= 4 + 8 + 8 + 4 + 8) {
              ts = be32(b, (co + 4 + 16).toInt)       // after 2×8-byte times
              dur = be64(b, (co + 4 + 16 + 4).toInt)
            } else if (version == 0 && ce - co >= 4 + 4 + 4 + 4 + 4) {
              ts = be32(b, (co + 4 + 8).toInt)        // after 2×4-byte times
              dur = be32(b, (co + 4 + 8 + 4).toInt)
            }
          }
        }: Unit
    }
    (brand, ts, dur) match {
      case (Some(br), t, d) if t > 0 && d >= 0 =>
        Some(Mp4Meta("mp4", br, t, d, d * 1000L / t, sizeOk = tiled))
      case _ => None
    }
  }

  private def be32b(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64b(v: Long): Array[Byte] = be32b(v >> 32) ++ be32b(v & 0xffffffffL)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32b(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** Raw payload of the first top-level `mdat` box — the sample-data
    * container (ISO 14496-12 §8.1.1). None for non-BMFF bytes or a
    * missing/overflowing mdat; never a throw (per-row isolation, same
    * contract as [[decodeMp4]]). The slice is the box payload verbatim
    * — frame layout inside it is the caller's codec contract, which is
    * exactly the ISO split: the container names the bytes, a codec
    * interprets them. */
  def mdatPayload(b: Array[Byte]): Option[Array[Byte]] = {
    if (b.length < 16 || tag(b, 4) != "ftyp") return None
    var res: Option[Array[Byte]] = None
    walk(b, 0L, b.length.toLong) { (typ, po, pe) =>
      if (typ == "mdat" && res.isEmpty && pe <= b.length)
        res = Some(b.slice(po.toInt, pe.toInt))
    }
    res
  }

  /** Encode a minimal deterministic MP4: ftyp(isom) + a free box +
    * moov(free + mvhd) — mvhd alternates version 0/1 by seed parity so
    * the parser's both field layouts stay exercised. Layout constants
    * are ISO 14496-12; the nested free boxes force a real sibling
    * walk, not an offset guess. */
  def encodeMp4(timescale: Int, durationTicks: Long, seed: Long): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32b(0L) ++ "iso2".getBytes("US-ASCII"))
    val pad = box("free", Array.fill(((seed % 5) + 1).toInt)(0x20.toByte))
    val mvhd =
      if (seed % 2 == 0)
        box("mvhd", Array[Byte](0, 0, 0, 0) ++          // version 0 + flags
          be32b(seed % 1000) ++ be32b(seed % 999) ++      // ctime, mtime
          be32b(timescale.toLong) ++ be32b(durationTicks))
      else
        box("mvhd", Array[Byte](1, 0, 0, 0) ++          // version 1 + flags
          be64b(seed % 1000) ++ be64b(seed % 999) ++      // 8-byte times
          be32b(timescale.toLong) ++ be64b(durationTicks))
    val moov = box("moov", box("free", Array.fill(3)(0.toByte)) ++ mvhd)
    ftyp ++ pad ++ moov
  }

  /** [[encodeMp4]] plus an `mdat` box carrying `frames` concatenated —
    * the sample-bearing variant for the video near-dup path.
    * durationTicks is pinned to the frame count so the container
    * metadata and the payload agree (decodeMp4 cross-checks one
    * against the other in CodecSpec). */
  def encodeMp4Frames(timescale: Int, seed: Long,
                      frames: Array[Array[Byte]]): Array[Byte] =
    encodeMp4(timescale, frames.length.toLong, seed) ++
      box("mdat", frames.flatten.toArray)
}
