package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{AudioCodec, ImageCodec, Multimodal, VideoCodec}

/** Real binary decode: the byte-level PNG/JPEG header parser against
  * bytes the JDK's own encoders produced, plus the partition-batched
  * Spark path end-to-end. */
class CodecSpec extends SparkSpec {

  test("PNG: IHDR dimensions, depth, color type, and CRC round-trip") {
    val bytes = ImageCodec.encodePng(13, 7, seed = 42L)
    val m = ImageCodec.decodePng(bytes).get
    assert(m.format == "png" && m.width == 13 && m.height == 7)
    assert(m.bitDepth == 8 && m.colorType == 2) // 8-bit truecolor
    assert(m.crcOk)
    // a flipped header byte must fail the CRC, not parse silently
    val corrupt = bytes.clone(); corrupt(17) = (corrupt(17) ^ 0x01).toByte
    assert(!ImageCodec.decodePng(corrupt).get.crcOk)
  }

  test("JPEG: SOF frame header yields dimensions and component count") {
    val bytes = ImageCodec.encodeJpeg(24, 9, seed = 7L)
    val m = ImageCodec.decodeJpeg(bytes).get
    assert(m.format == "jpeg" && m.width == 24 && m.height == 9)
    assert(m.bitDepth == 8 && m.colorType == 3) // 8-bit, 3 components
  }

  test("JPEG: 0xff fill bytes before a marker are skipped, not parsed") {
    // The spec permits any number of 0xff fill bytes ahead of a marker
    // id; inject some after SOI and before the next marker's 0xff.
    val bytes = ImageCodec.encodeJpeg(24, 9, seed = 7L)
    val fill = Array.fill(3)(0xff.toByte)
    val padded = bytes.take(2) ++ fill ++ bytes.drop(2)
    val m = ImageCodec.decodeJpeg(padded).get
    assert(m.width == 24 && m.height == 9 && m.colorType == 3)
  }

  test("decode() dispatches by signature and rejects non-images") {
    assert(ImageCodec.decode(ImageCodec.encodePng(2, 2, 1L)).get.format == "png")
    assert(ImageCodec.decode(ImageCodec.encodeJpeg(2, 2, 1L)).get.format == "jpeg")
    assert(ImageCodec.decode("not an image".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("WAV: fmt/data round-trip against the JDK's own writer") {
    val bytes = AudioCodec.encodeWav(channels = 2, sampleRateHz = 16000,
      nSamples = 77, seed = 5L)
    val m = AudioCodec.decodeWav(bytes).get
    assert(m.format == "wav" && m.audioFormat == 1) // PCM
    assert(m.channels == 2 && m.sampleRateHz == 16000)
    assert(m.bitsPerSample == 16 && m.nSamples == 77)
    assert(m.sizeOk)
    // a truncated payload must fail the RIFF size check, not parse ok
    assert(!AudioCodec.decodeWav(bytes.dropRight(4)).get.sizeOk)
    assert(AudioCodec.decodeWav("RIFFnope".getBytes("US-ASCII")).isEmpty)
    assert(AudioCodec.decodeWav(ImageCodec.encodePng(2, 2, 1L)).isEmpty)
    // a crafted chunk size whose Int truncation is negative must fall
    // off the end of the walk, not freeze it (Long offset arithmetic)
    val evil = bytes.clone()
    val fmtAt = 12 // canonical writer emits fmt first
    assert(new String(evil.slice(fmtAt, fmtAt + 4), "US-ASCII") == "fmt ")
    (0 until 4).foreach(i => evil(fmtAt + 4 + i) = 0xf8.toByte) // size 0xF8F8F8F8
    assert(AudioCodec.decodeWav(evil).isEmpty)
  }

  test("WAV: odd-sized chunks are word-aligned with a pad byte") {
    // Splice a 3-byte custom chunk between 'fmt ' and 'data'; per the
    // RIFF spec it must be followed by one pad byte, and the walker
    // has to skip BOTH to find 'data'.
    val bytes = AudioCodec.encodeWav(1, 8000, 10, 1L)
    val dataAt = {
      var off = 12
      while (new String(bytes.slice(off, off + 4), "US-ASCII") != "data")
        off += 8 + ((bytes(off + 4) & 0xff) | ((bytes(off + 5) & 0xff) << 8)) // sizes < 64k here
      off
    }
    val odd = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0) // id+size+3 bytes+pad
    val spliced = bytes.take(dataAt) ++ odd ++ bytes.drop(dataAt)
    // fix the RIFF size for the inserted bytes (little-endian at 4)
    val newSize = (spliced.length - 8).toLong
    (0 until 4).foreach(i => spliced(4 + i) = ((newSize >> (8 * i)) & 0xff).toByte)
    val m = AudioCodec.decodeWav(spliced).get
    assert(m.nSamples == 10 && m.channels == 1 && m.sizeOk, m.toString)
  }

  test("codecs are total on arbitrary bytes: terminate, never throw") {
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(128)
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      ImageCodec.decode(junk)       // Option, no exception
      AudioCodec.decodeWav(junk)    // Option, no exception
      // and with valid magic but garbage bodies
      AudioCodec.decodeWav("RIFF".getBytes ++ junk ++ "WAVE".getBytes ++ junk)
      ImageCodec.decode(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++ junk)
      ImageCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte) ++ junk)
    }
  }

  test("PCM extraction matches the generator sample-for-sample; total on junk") {
    // the data-chunk walk must agree with the encoder's sawtooth for
    // every (channels, rate, length) combination the corpus produces
    for (id <- Seq(0L, 1L, 7L, 153L)) {
      val ch = (1 + id % 2).toInt
      val n = (50 + id % 100).toInt
      val wav = AudioCodec.encodeWav(ch, (8000 + (id % 4) * 4000).toInt, n, id)
      val got = AudioCodec.pcmSamples16(wav).get
      assert(got.length == n * ch)
      got.zipWithIndex.foreach { case (v, i) =>
        assert(v == (((id + i * 2654435761L) % 4096) - 2048).toShort, s"id=$id i=$i")
      }
    }
    val rnd = new scala.util.Random(17)
    (1 to 100).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(96))(rnd.nextInt(256).toByte)
      AudioCodec.pcmSamples16(junk)                                     // no throw
      AudioCodec.pcmSamples16("RIFF".getBytes ++ junk ++ "WAVE".getBytes ++ junk)
    }
  }

  test("pcmSamples16 rejects 16-bit non-PCM payloads (format tag enforced)") {
    // a compressed codec (or WAVE_FORMAT_EXTENSIBLE 0xFFFE) declaring
    // 16 bits/sample must drop, not decode its payload as int16 PCM
    val wav = AudioCodec.encodeWav(1, 8000, 50, 3L)
    assert(AudioCodec.pcmSamples16(wav).isDefined)
    for (fakeFormat <- Seq(0x0002, 0xFFFE, 0x0055)) {
      val tampered = wav.clone()
      // fmt chunk follows the 12-byte RIFF/WAVE header in encodeWav
      // output; audioFormat is the first fmt field (offset 12+8)
      assert(new String(tampered.slice(12, 16), "US-ASCII") == "fmt ")
      tampered(20) = (fakeFormat & 0xff).toByte
      tampered(21) = ((fakeFormat >> 8) & 0xff).toByte
      assert(AudioCodec.pcmSamples16(tampered).isEmpty, f"format 0x$fakeFormat%04x")
      // metadata decode still reports the tag faithfully
      assert(AudioCodec.decodeWav(tampered).get.audioFormat == fakeFormat)
    }
  }

  test("resizeNearest: pixel-exact against the closed form; junk rows drop") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001")).limit(40)
    val resized = Multimodal.resizeNearest(Multimodal.syntheticPngs(docs), 4, 3)
    val stats = Multimodal.pixelStats(resized).collect()
    assert(stats.length == 40)
    stats.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((1 + id % 16).toInt, (1 + id % 9).toInt)
      val want = (for (x <- 0 until 4; y <- 0 until 3)
        yield (x * w / 4 * 31L + y * h / 3 * 17L + id) % 0x1000000L).sum
      assert(r.getLong(1) == 4 && r.getLong(2) == 3)
      assert(r.getLong(3) == want, s"px_sum mismatch for $id")
    }
    // an undecodable payload drops instead of failing the task
    val junk = Seq(Multimodal.MediaRow(99L, "image", Array[Byte](1, 2, 3),
      Multimodal.MediaMeta(0, 0, 0, 3L))).toDS()
    assert(Multimodal.resizeNearest(junk, 4, 3).count() == 0)
  }

  test("MP4: both mvhd versions round-trip; largesize escape; total on junk") {
    // v0 (even seed) and v1 (odd seed) layouts both parse
    for (seed <- Seq(0L, 1L, 42L, 43L)) {
      val m = VideoCodec.decodeMp4(VideoCodec.encodeMp4(1200, 777L, seed)).get
      assert(m.brand == "isom" && m.timescale == 1200L && m.durationTicks == 777L)
      assert(m.durationMs == 777L * 1000 / 1200 && m.sizeOk)
    }
    // hand-crafted size==1 largesize header on the moov box
    def be32b(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64b(v: Long) = be32b(v >> 32) ++ be32b(v & 0xffffffffL)
    val mvhd = be32b(8L + 4 + 16) ++ "mvhd".getBytes ++ Array[Byte](0, 0, 0, 0) ++
      be32b(0L) ++ be32b(0L) ++ be32b(600L) ++ be32b(90L)
    val ftyp = be32b(16L) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32b(0L)
    val moovLarge = be32b(1L) ++ "moov".getBytes ++ be64b(16L + mvhd.length) ++ mvhd
    val m2 = VideoCodec.decodeMp4(ftyp ++ moovLarge).get
    assert(m2.timescale == 600L && m2.durationTicks == 90L && m2.sizeOk)
    // totality on junk, with and without a plausible ftyp prefix
    val rnd = new scala.util.Random(23)
    (1 to 100).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(96))(rnd.nextInt(256).toByte)
      VideoCodec.decodeMp4(junk)                                        // no throw
      VideoCodec.decodeMp4(be32b(16L) ++ "ftyp".getBytes ++ junk)
    }
  }

  test("partition-batched Spark path: synthesize, decode, validate") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val meta = Multimodal.decodeImageMeta(Multimodal.syntheticPngs(docs))
    val rows = meta.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "png")
      assert(r.getLong(2) == 1 + id % 16, s"width mismatch for $id")
      assert(r.getLong(3) == 1 + id % 9, s"height mismatch for $id")
      assert(r.getLong(4) == 8 && r.getLong(5) == 2)
      assert(r.getBoolean(6), s"CRC failed for $id")
    }
  }

  test("perceptualHashes: closed-form bits for a known image; identical payloads hash equal") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    // two copies of seed-100 + the +2 brightness variant + junk
    val media = Seq(
      (0L, ImageCodec.encodePng(12, 10, 100L)),
      (1L, ImageCodec.encodePng(12, 10, 100L)),
      (2L, ImageCodec.encodePng(12, 10, 102L)),
      (3L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
      .as[(Long, Array[Byte])].map { case (id, p) =>
        Multimodal.MediaRow(id, "image", p,
          Multimodal.MediaMeta(0, 0, 0, 0L, p.length.toLong))
      }
    val sigs = Multimodal.perceptualHashes(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!sigs.contains(3L), "undecodable payloads must drop (F5)")
    assert(sigs(0L) == sigs(1L), "identical payloads must hash identically")
    // closed-form recompute of the aHash for (12, 10, seed 100)
    val gray = for (cy <- 0 until 8; cx <- 0 until 8) yield {
      val pv = (((cx * 12) / 8) * 31 + ((cy * 10) / 8) * 17 + 100) % (1 << 24)
      ((pv >> 16 & 255) + (pv >> 8 & 255) + (pv & 255)) / 3
    }
    val mu = gray.sum / 64
    var (hi, lo) = (0L, 0L)
    gray.zipWithIndex.foreach { case (gv, j) =>
      if (gv >= mu) { if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32) }
    }
    assert(sigs(0L) == ((hi, lo)),
      s"real-decode hash must equal the closed form: got ${sigs(0L)}, want ($hi,$lo)")
    // the +2 seed variant stays within banding reach (< 8 bits)
    val (h2, l2) = sigs(2L)
    val dist = java.lang.Long.bitCount(h2 ^ hi) + java.lang.Long.bitCount(l2 ^ lo)
    assert(dist <= 7, s"brightness nudge must stay a near-dup, hamming=$dist")
  }

  test("audioFingerprints: closed-form bits through the real encoder+decoder; truncation stays near") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(5L, 5L + 251L, 9L).toDF("doc_id") // group 5 (v0+v1) + group 9
    val media = Multimodal.syntheticWavClasses(docs)
    val fps = Multimodal.audioFingerprints(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // closed-form recompute for doc 5 (g=5, v=0, n=128)
    def sample(seed: Long, i: Long): Long = {
      var x = (seed + i) * 2654435761L % 4294967296L
      x = x ^ (x / 65536L)
      x = x % 268435456L * 2246822519L % 4294967296L
      x = x ^ (x / 8192L)
      x % 4096L - 2048L
    }
    def fpOf(g: Long, n: Int): Long = {
      val seed = g * 1009L + 7L
      var fp = 0L
      for (j <- 0 until 32) {
        val e = (4 * j until math.min(4 * j + 4, n))
          .map(i => math.abs(sample(seed, i))).sum
        if (e >= 4096L) fp |= 1L << j
      }
      fp
    }
    assert(fps(5L) == fpOf(5L, 128),
      "real decode must reproduce the closed-form fingerprint")
    assert(fps(5L + 251L) == fpOf(5L, 120))
    // the truncated generation differs only in the zeroed tail frames
    val d = java.lang.Long.bitCount(fps(5L) ^ fps(5L + 251L))
    assert(d <= 3, s"end truncation must stay within banding reach, hamming=$d")
    assert(java.lang.Long.bitCount(fps(5L) ^ fps(9L)) > 3,
      "distinct groups must not read as near-dups")
    // junk payloads drop (F5)
    val junk = Seq(Multimodal.MediaRow(99L, "audio", Array[Byte](1, 2, 3),
      Multimodal.MediaMeta(0, 0, 0, 0L, 3L))).toDS()
    assert(Multimodal.audioFingerprints(junk).count() == 0)
  }

  test("audioNearDupPairs: banded pairs EQUAL brute-force all-pairs (pigeonhole exactness)") {
    import org.apache.spark.sql.functions._
    val docs = sources.Tables.documents(spark, sf("sf0.001"))
    val fps = Multimodal.audioFingerprints(Multimodal.syntheticWavClasses(docs))
    val banded = Multimodal.audioNearDupPairs(fps, 3)
      .select("d1", "d2", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val l = fps.select(col("media_id").as("d1"), col("fp").as("fp1"))
    val r = fps.select(col("media_id").as("d2"), col("fp").as("fp2"))
    val brute = l.crossJoin(r).filter(col("d1") < col("d2"))
      .withColumn("hamming", bit_count(expr("fp1 ^ fp2")).cast("long"))
      .filter(col("hamming") <= 3)
      .select("d1", "d2", "hamming") // joined frame interleaves fp columns
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(banded == brute, s"banding must be exact: ${banded.size} vs ${brute.size}")
    assert(banded.nonEmpty, "corpus must contain near-dup audio pairs")
  }

  test("phashNearDupPairs: banded pairs EQUAL brute-force all-pairs (pigeonhole exactness)") {
    import org.apache.spark.sql.functions._
    val docs = sources.Tables.documents(spark, sf("sf0.001"))
    val sigs = Multimodal.perceptualHashes(Multimodal.syntheticPngClasses(docs))
    val banded = Multimodal.phashNearDupPairs(sigs, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val l = sigs.select(col("media_id").as("d1"), col("ph_hi").as("hi1"), col("ph_lo").as("lo1"))
    val r = sigs.select(col("media_id").as("d2"), col("ph_hi").as("hi2"), col("ph_lo").as("lo2"))
    val brute = l.crossJoin(r).filter(col("d1") < col("d2"))
      .withColumn("hamming",
        (bit_count(expr("hi1 ^ hi2")) + bit_count(expr("lo1 ^ lo2"))).cast("long"))
      .filter(col("hamming") <= 6)
      .select("d1", "d2", "hamming") // joined frame interleaves hi/lo columns
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(banded == brute, s"banding must be exact: ${banded.size} vs ${brute.size}")
    assert(banded.nonEmpty, "corpus must contain near-dup image pairs")
    // group structure: near-dups only within a pixel class
    assert(banded.forall { case (d1, d2, _) => d1 % 41 == d2 % 41 },
      "hamming<=6 pairs must stay within their pixel class on this corpus")
  }

  test("phashNearDupPairsCapped: capped ∪ overflow ≡ uncapped; capped-only is the bounded subset") {
    import org.apache.spark.sql.functions.col
    val docs = sources.Tables.documents(spark, sf("sf0.001"))
    val sigs = Multimodal.perceptualHashes(Multimodal.syntheticPngClasses(docs))
    val uncapped = Multimodal.phashNearDupPairs(sigs, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val labeled = Multimodal.phashNearDupPairsCapped(sigs, 6, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(labeled.map(t => (t._1, t._2, t._3)).toSet == uncapped,
      "capped ∪ overflow must reproduce the uncapped pair set exactly")
    assert(labeled.map(t => (t._1, t._2)).distinct.length == labeled.length,
      "labels must partition the pairs (capped-path priority)")
    assert(labeled.exists(_._4 == "overflow"),
      "fixture has buckets past the cap — an all-capped result is vacuous")
    // the production fuse: capped-only equals exactly the 'capped' rows
    val fuse = Multimodal.phashNearDupPairsCapped(sigs, 6, 2, includeOverflow = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fuse == labeled.filter(_._4 == "capped").map(t => (t._1, t._2, t._3)).toSet)
    assert(fuse.size < uncapped.size,
      "the cap must actually shrink output on this clique-heavy corpus")
  }

  test("incrementalPhashPairs: O(delta) probe — every pair touches the delta, union equals batch") {
    import org.apache.spark.sql.functions.col
    val docs = sources.Tables.documents(spark, sf("sf0.001"))
    val sigs = Multimodal.perceptualHashes(Multimodal.syntheticPngClasses(docs))
    val store = Multimodal.phashBandRows(sigs.filter(col("media_id") % 3 =!= 0))
      .localCheckpoint(true)
    val deltaSigs = sigs.filter(col("media_id") % 3 === 0)
    val deltaIds = deltaSigs.select("media_id").collect().map(_.getLong(0)).toSet
    val incr = Multimodal.incrementalPhashPairs(store, deltaSigs, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(incr.nonEmpty && incr.forall(p => deltaIds(p._1) || deltaIds(p._2)),
      "incremental output must be delta-driven only")
    assert(incr.exists(p => !deltaIds(p._1) || !deltaIds(p._2)),
      "no delta x stored pair found — the store probe is vacuous on this fixture")
    val stored = Multimodal.phashPairsFromStore(store, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stored.forall(p => !deltaIds(p._1) && !deltaIds(p._2)),
      "store pairs must not leak delta members (the union would double-count)")
    val batch = Multimodal.phashNearDupPairs(sigs, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert((stored ++ incr).toSet == batch && stored.length + incr.length == batch.size,
      "store ∪ incremental must equal the batch recompute with no overlap")
  }

  test("mdat round-trip: frames encode into a real container and slice back out") {
    val frames = Array.tabulate(5)(f => Array.tabulate(64)(j => (f * 64 + j).toByte))
    val b = VideoCodec.encodeMp4Frames(1000, 7L, frames)
    // container metadata still parses and agrees with the payload
    val m = VideoCodec.decodeMp4(b).get
    assert(m.durationTicks == 5L && m.sizeOk, "durationTicks must pin the frame count")
    val md = VideoCodec.mdatPayload(b).get
    assert(md.length == 320 && md.sameElements(Array.concat(frames: _*)),
      "mdat payload must round-trip byte-exact")
    // totality: junk and mdat-less files return None, never throw
    assert(VideoCodec.mdatPayload(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoCodec.mdatPayload(VideoCodec.encodeMp4(1000, 5L, 7L)).isEmpty)
  }

  test("videoSignatures: closed-form bits through the real container; brightness nudge stays near") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(5L, 5L + 61L, 9L).toDF("doc_id") // group 5 (v0+v1) + group 9
    val sigs = Multimodal.videoSignatures(Multimodal.syntheticMp4Classes(docs))
      .collect().map(r => r.getLong(0) ->
        Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // closed-form recompute for doc 5 (g=5, v=0): nf=8, seed=5*1013+11
    def mix(u: Long): Long = {
      var x = u * 2654435761L % 4294967296L
      x = x ^ (x / 65536L)
      x = x % 268435456L * 2246822519L % 4294967296L
      x ^ (x / 8192L)
    }
    def sigOf(g: Long, v: Long): Array[Long] = {
      val nf = 6 + g % 3
      val seed = g * 1013L + 11L
      Array.tabulate(4) { s =>
        val f = s * nf / 4
        (0 until 32).foldLeft(0L) { (w, t) =>
          if ((mix(seed + 2 * t + 64 * f) % 256 + 2 * v) % 256 >= 128) w | (1L << t) else w
        }
      }
    }
    assert(sigs(5L).sameElements(sigOf(5L, 0L)),
      "real decode must reproduce the closed-form signature")
    assert(sigs(5L + 61L).sameElements(sigOf(5L, 1L)))
    def ham(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(ham(sigs(5L), sigs(5L + 61L)) <= 10,
      "the +2 brightness generation must stay within banding reach")
    assert(ham(sigs(5L), sigs(9L)) > 15,
      "distinct clip classes must not read as near-dups")
    // junk payloads drop (F5)
    val junk = Seq(Multimodal.MediaRow(99L, "video", Array[Byte](1, 2, 3),
      Multimodal.MediaMeta(0, 0, 0, 0L, 3L))).toDS()
    assert(Multimodal.videoSignatures(junk).count() == 0)
  }

  test("videoNearDupPairs: banded pairs EQUAL brute-force all-pairs (pigeonhole exactness)") {
    import org.apache.spark.sql.functions._
    val docs = sources.Tables.documents(spark, sf("sf0.001"))
    val sigs = Multimodal.videoSignatures(Multimodal.syntheticMp4Classes(docs))
    val banded = Multimodal.videoNearDupPairs(sigs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val l = sigs.select(col("media_id").as("d1"), col("w0").as("a0"),
      col("w1").as("a1"), col("w2").as("a2"), col("w3").as("a3"))
    val r = sigs.select(col("media_id").as("d2"), col("w0").as("b0"),
      col("w1").as("b1"), col("w2").as("b2"), col("w3").as("b3"))
    val brute = l.crossJoin(r).filter(col("d1") < col("d2"))
      .withColumn("hamming",
        (bit_count(expr("a0 ^ b0")) + bit_count(expr("a1 ^ b1")) +
          bit_count(expr("a2 ^ b2")) + bit_count(expr("a3 ^ b3"))).cast("long"))
      .filter(col("hamming") <= 10)
      .select("d1", "d2", "hamming")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(banded == brute, s"banding must be exact: ${banded.size} vs ${brute.size}")
    assert(banded.nonEmpty, "corpus must contain near-dup video pairs")
    assert(banded.forall { case (d1, d2, _) => d1 % 61 == d2 % 61 },
      "hamming<=10 pairs must stay within their clip class on this corpus")
  }
}
