package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * BINARY columns + typed metadata, with feature extraction as a
  * partition-batched transform.
  *
  * Codec status: the FORMAT layer is real — byte-level PNG/JPEG
  * (ImageCodec), WAV/RIFF incl. int16 PCM extraction (AudioCodec),
  * ISO-BMFF/MP4 (VideoCodec), plus full pixel decode/encode and
  * nearest-neighbor resize through the JDK's ImageIO (q82/q104/q109/
  * q110/q111 hash-verify all of it against closed-form oracles). Only
  * the ML-embedding step is a stand-in: `decodeWith` takes any
  * byte→float-vector decoder and `FakeDecoder` is the deterministic
  * stub the tests use (no ONNX runtime in this container) — swapping
  * in a real embedding model changes one function value, not the
  * plumbing.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no base64
  * blow-up); decode runs mapPartitions so a model/codec loads once per
  * partition, not per row; features come back as ARRAY<FLOAT> ready
  * for analytics.Similarity.
  */
object Multimodal {

  /** ImageIO defaults to a FILE-backed stream cache — a temp file per
    * decode/encode, which dominates per-image cost at corpus scale
    * (measured: q109's 5 000 decode→resize→encode→decode chains drop
    * ~2× with the memory-backed cache). Executor-side, idempotent;
    * called at the top of every ImageIO-using partition. */
  private def imageIOInMemory(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata travels beside the opaque payload — the schema
    * contract for image/audio/video columns (dims for images, rate +
    * duration for audio/video, `nBytes` = payload length for every
    * kind; unused fields zero — a time-unit field never carries a
    * byte count). */
  final case class MediaMeta(
      width: Int, height: Int, sampleRateHz: Int, durationMs: Long,
      nBytes: Long = 0L)
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      content_sha: String, features: Array[Float])
  final case class FrameFeatures(
      media_id: Long, frame_idx: Int, features: Array[Float])

  /** Wrap a text/binary frame into the media schema (payload = UTF-8
    * bytes when starting from a text column, as the corpus does). */
  def fromText(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
               kind: String = "blob"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), lit(kind), col(textCol).cast("binary"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, k, b) =>
        MediaRow(id, k, b, MediaMeta(0, 0, 0, 0L, nBytes = b.length.toLong))
      }
  }

  /** The stand-in decoder: deterministic pseudo-features from the
    * payload's sha-256 — byte i scaled to [-0.5, 0.5). A real system
    * plugs an image/audio decoder with the same signature.
    */
  object FakeDecoder extends (Array[Byte] => Array[Float]) with Serializable {
    def apply(payload: Array[Byte]): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(payload).take(8).map(b => ((b & 0xff) / 256.0f) - 0.5f)
    }
  }

  /** Partition-batched decode/feature-extract (the Scala analog of a
    * pandas mapInPandas UDF: one decoder instance per partition,
    * iterator-to-iterator, spill-friendly). */
  def decodeWith(media: Dataset[MediaRow],
                 decoder: Array[Byte] => Array[Float]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val sha = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, sha, decoder(r.payload))
      }
    }
  }

  /** Resize: re-encode the payload to a bounded size (stub = byte
    * truncation; a real image resize plugs in with the same
    * signature). Metadata is updated alongside the payload — the
    * point of the contract: payload transforms never detach from
    * their typed metadata. */
  def resize(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val p = if (r.payload.length <= maxBytes) r.payload else r.payload.take(maxBytes)
      r.copy(payload = p, meta = r.meta.copy(nBytes = p.length.toLong))
    }
  }

  /** REAL pixel-level image resize: full PNG/JPEG decode through the
    * JDK's ImageIO (inflate + unfilter — not just the header walk),
    * deterministic nearest-neighbor mapping
    * `src = (dst * srcDim) / dstDim` in INTEGER arithmetic (the
    * engine-portable spelling — q109's oracle recomputes it with `//`),
    * PNG re-encode, metadata updated beside the payload. Undecodable
    * payloads DROP (per-row error isolation, F5) rather than failing
    * the task. Partition-batched like every codec step. */
  def resizeNearest(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      imageIOInMemory()
      rows.flatMap { r =>
        val img = try {
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
        } catch { case _: Throwable => None }
        img.map { src =>
          val out = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < th) {
            val sy = y * src.getHeight / th
            var x = 0
            while (x < tw) {
              out.setRGB(x, y, src.getRGB(x * src.getWidth / tw, sy))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val p = bos.toByteArray
          r.copy(payload = p, meta = r.meta.copy(width = tw, height = th,
            nBytes = p.length.toLong))
        }
      }
    }
  }

  /** Pixel statistics via a REAL full decode: (media_id, width,
    * height, px_sum = Σ 24-bit RGB over all pixels) — the verifiable
    * probe of any pixel transform (q109 checks resizeNearest's output
    * against a closed-form oracle through it). Undecodable payloads
    * surface as (-1, -1, -1) rows. */
  def pixelStats(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      imageIOInMemory()
      rows.map { r =>
        val img = try {
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
        } catch { case _: Throwable => None }
        img match {
          case Some(m) =>
            var s = 0L
            var y = 0
            while (y < m.getHeight) {
              var x = 0
              while (x < m.getWidth) {
                s += (m.getRGB(x, y) & 0xffffff).toLong
                x += 1
              }
              y += 1
            }
            (r.media_id, m.getWidth.toLong, m.getHeight.toLong, s)
          case None => (r.media_id, -1L, -1L, -1L)
        }
      }
    }.toDF("media_id", "width", "height", "px_sum")
  }

  /** Synthesize a deterministic minimal MP4 per row (timescale /
    * duration / mvhd version derived from the id) — the corpus
    * stand-in for a video column (the triple's third leg next to
    * syntheticPngs/syntheticWavs). */
  def syntheticMp4s(df: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Guards.parallelismFloor(
      df.select(col(idCol).cast("long"))).as[Long].mapPartitions { it =>
      it.map { id =>
        val ts = (600 * (1 + id % 3)).toInt
        val dur = 100 + id % 1000
        val p = VideoCodec.encodeMp4(ts, dur, id)
        MediaRow(id, "video", p,
          MediaMeta(0, 0, ts, dur * 1000L / ts, nBytes = p.length.toLong))
      }
    }
  }

  /** REAL video-container decode over the partition-batched path:
    * byte-level ISO-BMFF box walk (VideoCodec) — brand, mvhd
    * timescale/duration (both versions), integer-ms duration, size
    * tiling check; unparseable payloads surface as format='unknown'
    * rows (F5 isolation). */
  def decodeVideoMeta(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = VideoCodec.decodeMp4(r.payload)
        (r.media_id, m.map(_.format).getOrElse("unknown"),
          m.map(_.brand).getOrElse(""),
          m.map(_.timescale).getOrElse(-1L),
          m.map(_.durationTicks).getOrElse(-1L),
          m.map(_.durationMs).getOrElse(-1L),
          m.exists(_.sizeOk))
      }
    }.toDF("media_id", "format", "brand", "timescale", "duration_ticks",
      "duration_ms", "size_ok")
  }

  /** REAL audio frame sampling: the WAV data chunk decodes to
    * interleaved int16 PCM (AudioCodec.pcmSamples16 — same RIFF walk
    * as the metadata codec), frames of `frameSamples` values, every
    * `stride`-th frame kept, per-frame count + amplitude sum — the
    * video/audio fan-out shape (one row in, N frame rows out) with a
    * closed-form oracle (q110). Non-PCM16/undecodable payloads drop
    * (F5 isolation). */
  def frameAmplitudes(media: Dataset[MediaRow], frameSamples: Int,
                      stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        AudioCodec.pcmSamples16(r.payload).iterator.flatMap { samples =>
          samples.grouped(frameSamples).zipWithIndex
            .filter { case (_, j) => j % stride == 0 }
            .map { case (fr, j) =>
              (r.media_id, j.toLong, fr.length.toLong, fr.foldLeft(0L)(_ + _))
            }
        }
      }
    }.toDF("media_id", "frame_idx", "n_samples", "amp_sum")
  }

  /** Synthesize a deterministic tiny PNG per row (dimensions derived
    * from the id, pixels from ImageCodec's fixed function) — the
    * corpus stand-in for an image column, produced by a REAL encoder
    * (JDK ImageIO) so decodeImageMeta parses genuine PNG bytes. */
  def syntheticPngs(df: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Guards.parallelismFloor(
      df.select(col(idCol).cast("long"))).as[Long].mapPartitions { it =>
      imageIOInMemory()
      it.map { id =>
        val w = (1 + id % 16).toInt
        val h = (1 + id % 9).toInt
        val p = ImageCodec.encodePng(w, h, id)
        MediaRow(id, "image", p, MediaMeta(w, h, 0, 0L, nBytes = p.length.toLong))
      }
    }
  }

  /** REAL header decode over the partition-batched path: byte-level
    * PNG IHDR / JPEG SOF parsing (ImageCodec) with CRC validation —
    * unparseable payloads surface as format='unknown' rows rather
    * than task failures (per-row error isolation, F5). */
  def decodeImageMeta(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = ImageCodec.decode(r.payload)
        (r.media_id, m.map(_.format).getOrElse("unknown"),
          m.map(_.width.toLong).getOrElse(-1L), m.map(_.height.toLong).getOrElse(-1L),
          m.map(_.bitDepth.toLong).getOrElse(-1L), m.map(_.colorType.toLong).getOrElse(-1L),
          m.exists(_.crcOk))
      }
    }.toDF("media_id", "format", "width", "height", "bit_depth", "color_type", "crc_ok")
  }

  /** Synthesize a deterministic tiny WAV per row (rate/channels/
    * length derived from the id) through the JDK's own audio writer —
    * the corpus stand-in for an audio column, real bytes for
    * decodeAudioMeta to parse (the audio twin of syntheticPngs). */
  def syntheticWavs(df: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val rate = (8000 + (id % 4) * 4000).toInt
        val ch = (1 + id % 2).toInt
        val n = (50 + id % 100).toInt
        val p = AudioCodec.encodeWav(ch, rate, n, id)
        MediaRow(id, "audio", p,
          MediaMeta(0, 0, rate, n.toLong * 1000L / rate, nBytes = p.length.toLong))
      }
    }
  }

  /** REAL audio-header decode over the partition-batched path:
    * byte-level WAV/RIFF chunk walk (AudioCodec) with size
    * validation — unparseable payloads surface as format='unknown'
    * rows rather than task failures (per-row error isolation, F5). */
  def decodeAudioMeta(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = AudioCodec.decodeWav(r.payload)
        (r.media_id, m.map(_.format).getOrElse("unknown"),
          m.map(_.audioFormat.toLong).getOrElse(-1L),
          m.map(_.channels.toLong).getOrElse(-1L),
          m.map(_.sampleRateHz.toLong).getOrElse(-1L),
          m.map(_.bitsPerSample.toLong).getOrElse(-1L),
          m.map(_.nSamples).getOrElse(-1L),
          m.exists(_.sizeOk))
      }
    }.toDF("media_id", "format", "audio_format", "channels",
      "sample_rate", "bits", "n_samples", "size_ok")
  }

  /** Frame sampling: split the payload into fixed-size windows
    * ("frames"), keep every `stride`-th, extract features per frame —
    * the video/audio fan-out shape (one row in, N frame rows out,
    * iterator-to-iterator so a long video never materializes all
    * frames in memory at once). */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int, stride: Int,
                  decoder: Array[Byte] => Array[Float] = FakeDecoder): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (frame, i) => FrameFeatures(r.media_id, i, decoder(frame)) }
    }
  }

  /** Near-dup image corpus: documents partition into `nGroups` pixel
    * classes (group = id % nGroups decides dimensions and the pixel
    * pattern); alternating document "generations" within a group add
    * +2 to every 24-bit pixel AFTER the pattern mix — a whole-image
    * brightness nudge that leaves the perceptual hash within a few
    * bits of the base class (re-encoded screenshots / re-saved
    * thumbnails, the dominant image-dup mode in scraped corpora).
    * The per-pixel pattern is a Knuth multiplicative mix
    * ((x + 16y + 1024g)·2654435761 mod 2^24): pseudorandom per cell,
    * so distinct groups land ~32 aHash bits apart — a plain gradient
    * (ImageCodec's x·31+y·17 function) thresholds to near-identical
    * half-plane bit patterns for EVERY seed and the whole corpus
    * collapses into one near-dup class (measured before this mix was
    * chosen). Every pixel stays closed-form, so a DuckDB oracle
    * recomputes the hash pipeline without decoding a byte. */
  def syntheticPngClasses(df: DataFrame, idCol: String = "doc_id",
                          nGroups: Int = 41): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Guards.parallelismFloor(
      df.select(col(idCol).cast("long"))).as[Long].mapPartitions { it =>
      imageIOInMemory()
      it.map { id =>
        val g = id % nGroups
        val v = (id / nGroups) % 2
        val w = (8 + g % 9).toInt
        val h = (8 + g % 5).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val pv = ((x + 16L * y + 1024L * g) * 2654435761L % 16777216L
              + v * 2L) % 16777216L
            img.setRGB(x, y, pv.toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val p = bos.toByteArray
        MediaRow(id, "image", p, MediaMeta(w, h, 0, 0L, nBytes = p.length.toLong))
      }
    }
  }

  /** 64-bit average-hash (aHash) perceptual signature through a REAL
    * decode: full ImageIO pixel decode, 8×8 nearest-neighbor
    * downsample in INTEGER arithmetic (sx = (cx·w)//8 — the q109
    * engine-portable spelling), integer grayscale (r+g+b)//3, mean
    * threshold with a FLOOR-divided mean — every step integer-exact
    * so an oracle reproduces the bits from the closed-form pixels.
    * Packed as two 32-bit words (hi = cells 32–63) because a signed
    * 64-bit top bit is a cross-engine trap. Undecodable payloads drop
    * (F5 per-row isolation). */
  def perceptualHashes(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      imageIOInMemory()
      rows.flatMap { r =>
        val img = try {
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
        } catch { case _: Throwable => None }
        img.map { m =>
          val gray = new Array[Int](64)
          var sum = 0
          var cy = 0
          while (cy < 8) {
            val sy = cy * m.getHeight / 8
            var cx = 0
            while (cx < 8) {
              val p = m.getRGB(cx * m.getWidth / 8, sy) & 0xffffff
              val gval = ((p >> 16 & 255) + (p >> 8 & 255) + (p & 255)) / 3
              gray(cy * 8 + cx) = gval
              sum += gval
              cx += 1
            }
            cy += 1
          }
          val mu = sum / 64
          var lo = 0L
          var hi = 0L
          var j = 0
          while (j < 64) {
            if (gray(j) >= mu) {
              if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
            }
            j += 1
          }
          (r.media_id, hi, lo)
        }
      }
    }.toDF("media_id", "ph_hi", "ph_lo")
  }

  /** Near-dup audio corpus — the WAV face of [[syntheticPngClasses]]:
    * documents partition into `nGroups` PCM classes (group decides
    * the sawtooth seed); alternating generations TRUNCATE the
    * recording by 8 samples (a re-trimmed clip, the dominant audio-dup
    * mode in scraped corpora) rather than perturbing values — the
    * encoder mixes the seed per sample, so any seed nudge would
    * scramble the whole signal. Mono, so PCM index i is the closed
    * form directly (the Murmur-style mix in the body) — a DuckDB
    * oracle recomputes the fingerprint pipeline without parsing a
    * byte. */
  def syntheticWavClasses(df: DataFrame, idCol: String = "doc_id",
                          nGroups: Int = 251): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val g = id % nGroups
        val v = (id / nGroups) % 2
        val n = (128 - v * 8).toInt
        // well-mixed closed form (two multiply + xor-shift rounds, a
        // Murmur-style finalizer in 32-bit modular arithmetic): any
        // LINEAR function of the sample index — the standard sawtooth,
        // or single-multiply middle bits — keeps per-frame energies on
        // an arithmetic progression and fingerprints correlate ACROSS
        // groups (measured: 1.2M cross-group pairs at sf0.1); the
        // xor-shift rounds break linearity and restore the
        // ~binomial(32, 1/2) cross-group Hamming profile the banding
        // math assumes. Every step is nonneg integer arithmetic, so a
        // DuckDB oracle reproduces it with *, //, %, xor()
        val seed = g * 1009L + 7L
        val samples = Array.tabulate(n) { i =>
          var x = (seed + i) * 2654435761L % 4294967296L
          x = x ^ (x / 65536L)
          // clamp to 2^28 before the second multiply: 2^32 × the
          // constant overflows signed 64-bit (and DuckDB BIGINT
          // arithmetic is checked, so the oracle would ERROR, not wrap)
          x = x % 268435456L * 2246822519L % 4294967296L
          x = x ^ (x / 8192L)
          (x % 4096L - 2048L).toShort
        }
        val p = AudioCodec.encodeWavSamples(1, 8000, samples)
        MediaRow(id, "audio", p,
          MediaMeta(0, 0, 8000, n.toLong * 1000L / 8000L, p.length.toLong))
      }
    }
  }

  /** 32-bit acoustic fingerprint through a REAL decode: the WAV's
    * int16 PCM (AudioCodec's RIFF walk), 32 frames of 4 samples over
    * the first 128 samples, per-frame energy Σ|s| in INTEGER
    * arithmetic (missing samples past a truncated recording
    * contribute zero), bit = energy ≥ a FIXED reference level (4096 =
    * 4 samples × the int16 sawtooth's expected |amplitude| 1024).
    * Fixed, not the aHash mean threshold ([[perceptualHashes]]):
    * against the dominant audio-dup mode — end truncation — a mean
    * threshold couples EVERY bit to the tail (dropping two frames
    * shifts μ ~6%, flipping ~5 boundary bits on this signal family),
    * while a fixed level confines the difference to the truncated
    * frames themselves. Integer-exact end to end, so an oracle
    * reproduces every bit from the closed-form samples. One 32-bit
    * word. Undecodable / non-PCM payloads drop (F5). */
  def audioFingerprints(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        AudioCodec.pcmSamples16(r.payload).map { pcm =>
          var fp = 0L
          var j = 0
          while (j < 32) {
            var acc = 0L
            var i = 4 * j
            val end = math.min(4 * j + 4, math.min(pcm.length, 128))
            while (i < end) { acc += math.abs(pcm(i).toLong); i += 1 }
            if (acc >= 4096L) fp |= 1L << j
            j += 1
          }
          (r.media_id, fp)
        }
      }
    }.toDF("media_id", "fp")
  }

  /** Acoustic near-dup pairs with Hamming distance ≤ `maxDist` over
    * the 32-bit fingerprint — the [[phashNearDupPairs]] machinery one
    * word narrower: 4 bands × 8 bits, candidates share a (band,
    * value) bucket, full-fingerprint Hamming verify. EXACT for
    * maxDist ≤ 3 by pigeonhole; same pre-shuffle Hamming filter, no
    * cross join, same clique-degradation bound. */
  def audioNearDupPairs(fps: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, s"4x8 banding is exact only to distance 3, got $maxDist")
    val banded = fps.select(col("media_id"), col("fp"),
        explode(array((0 until 4).map(lit): _*)).as("k"))
      .withColumn("band",
        expr("shiftright(fp, k * 8)").bitwiseAND(lit(255L)))
    val l = banded.select(col("k"), col("band"), col("media_id").as("d1"),
      col("fp").as("fp1"))
    val r = banded.select(col("k"), col("band"), col("media_id").as("d2"),
      col("fp").as("fp2"))
    l.join(r, Seq("k", "band")).filter(col("d1") < col("d2"))
      .withColumn("hamming", bit_count(expr("fp1 ^ fp2")).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming"))
      .distinct()
  }

  /** Near-dup video corpus — [[syntheticPngClasses]] on the time axis:
    * documents partition into `nGroups` clip classes (group decides
    * the frame seed and the frame count 6 + g%3); alternating
    * generations add +2 mod 256 to every frame byte — a whole-clip
    * brightness nudge (a re-encoded upload, the dominant video-dup
    * mode in scraped corpora). Frames are raw 8×8 grayscale (64
    * bytes) inside a REAL ISO-BMFF container ([[VideoCodec
    * .encodeMp4Frames]]): the container walk, largesize escape and
    * mvhd version split all stay on the decode path. Frame byte j of
    * frame f is the same Murmur-style two-round mix as
    * [[syntheticWavClasses]] over (seed + j + 64f) — a single
    * multiplicative round collapses here because gray = x mod 256
    * only sees the LOW byte (2654435761 mod 256 = 177 and the group
    * stride 4096 mod 256 = 0, so every group would emit identical
    * frames); the xor-shift rounds push group entropy into the low
    * byte. Closed form end to end, so a DuckDB oracle recomputes
    * every signature bit without parsing a byte. */
  def syntheticMp4Classes(df: DataFrame, idCol: String = "doc_id",
                          nGroups: Int = 61): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Guards.parallelismFloor(
      df.select(col(idCol).cast("long"))).as[Long].mapPartitions { it =>
      it.map { id =>
        val g = id % nGroups
        val v = (id / nGroups) % 2
        val nf = (6 + g % 3).toInt
        val seed = g * 1013L + 11L
        val frames = Array.tabulate(nf) { f =>
          Array.tabulate(64) { j =>
            var x = (seed + j + 64L * f) * 2654435761L % 4294967296L
            x = x ^ (x / 65536L)
            x = x % 268435456L * 2246822519L % 4294967296L
            x = x ^ (x / 8192L)
            ((x % 256L + 2L * v) % 256L).toByte
          }
        }
        val p = VideoCodec.encodeMp4Frames(1000, g, frames)
        MediaRow(id, "video", p,
          MediaMeta(8, 8, 0, nf.toLong, p.length.toLong))
      }
    }
  }

  /** 128-bit temporal video signature through a REAL container decode:
    * [[VideoCodec.mdatPayload]] walks the boxes to the sample data,
    * frames are 64-byte 8×8 grayscale, and 4 frames sampled evenly
    * across the clip (f = s·nFrames/4 — trims and frame-rate drops
    * move which frames are compared, so the sample grid is defined by
    * POSITION, not index) each contribute 32 bits: bit t = frame byte
    * 2t ≥ a FIXED 128 level (the audioFingerprints lesson — a mean
    * threshold couples every bit to global brightness, a fixed level
    * confines a +2 nudge to the cells it actually crosses; measured
    * here: gen-pair Hamming ≤ 6 of 128, cross-group ≥ 44). Four
    * 32-bit words w0–w3, never a signed top bit (the q125 packing
    * trap). Non-BMFF / frameless payloads drop (F5). Integer-exact
    * end to end — the oracle reproduces every bit. */
  def videoSignatures(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        VideoCodec.mdatPayload(r.payload).filter(_.length >= 64).map { md =>
          val nf = md.length / 64
          val ws = Array.tabulate(4) { s =>
            val f = s * nf / 4
            var w = 0L
            var t = 0
            while (t < 32) {
              if ((md(f * 64 + 2 * t) & 0xff) >= 128) w |= 1L << t
              t += 1
            }
            w
          }
          (r.media_id, ws(0), ws(1), ws(2), ws(3))
        }
      }
    }.toDF("media_id", "w0", "w1", "w2", "w3")
  }

  /** Temporal-signature video near-dup pairs with Hamming distance ≤
    * `maxDist` over the 128-bit signature — the [[phashNearDupPairs]]
    * machinery two words wider: 16 bands × 8 bits, candidates share a
    * (band, value) bucket, full-signature verify. EXACT for maxDist ≤
    * 15 by pigeonhole; same pre-shuffle Hamming filter, no cross
    * join, same clique-degradation bound as the image/audio faces. */
  def videoNearDupPairs(sigs: DataFrame, maxDist: Int = 10): DataFrame = {
    require(maxDist <= 15, s"16x8 banding is exact only to distance 15, got $maxDist")
    val banded = sigs.select(col("media_id"), col("w0"), col("w1"), col("w2"), col("w3"),
        explode(array((0 until 16).map(lit): _*)).as("k"))
      .withColumn("band",
        expr("shiftright(element_at(array(w0, w1, w2, w3), CAST(k div 4 AS INT) + 1), (k % 4) * 8)")
          .bitwiseAND(lit(255L)))
    val l = banded.select(col("k"), col("band"), col("media_id").as("d1"),
      col("w0").as("a0"), col("w1").as("a1"), col("w2").as("a2"), col("w3").as("a3"))
    val r = banded.select(col("k"), col("band"), col("media_id").as("d2"),
      col("w0").as("b0"), col("w1").as("b1"), col("w2").as("b2"), col("w3").as("b3"))
    l.join(r, Seq("k", "band")).filter(col("d1") < col("d2"))
      .withColumn("hamming",
        (bit_count(expr("a0 ^ b0")) + bit_count(expr("a1 ^ b1")) +
          bit_count(expr("a2 ^ b2")) + bit_count(expr("a3 ^ b3"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming"))
      .distinct()
  }

  /** [[phashNearDupPairs]] under a hot-bucket member cap — the batch
    * face of [[graft.streaming.HammingStream]]'s maxBucketIds latch,
    * and the media-family answer to the measured 10× cliff: pair
    * ENUMERATION over replicated corpora is output-bound (SCALING.md
    * round-9 media run: pairs ×101, wall ×31 — the banded join is
    * fine, the answer itself is quadratic), so the 100 TB spelling
    * caps each (band-index, band-value) bucket at `maxBucketIds`
    * members (lowest ids kept — the q114 ranking, which the oracle
    * reproduces with the same window) and the candidate join runs on
    * the capped store: ≤ C(M,2) candidate pairs per bucket, bounded
    * regardless of clique structure. A near-dup pair has nBands
    * independent chances to co-survive a cap — but within a mass-dup
    * clique all signatures share ALL bands, so survival collapses to
    * one chance and output degrades toward C(M,2) per clique: the
    * q122 one-chance regime, i.e. a memory FUSE, not a recall
    * guarantee (the q118 many-chances math does not apply — see the
    * CLAUDE.md rule this measured).
    *
    * `includeOverflow = true` adds the q114 reconciliation: pairs a
    * diverted (rn > M) member forms with its full bucket, labeled
    * 'overflow' (capped-path priority on overlap) — then
    * capped ∪ overflow ≡ the uncapped operator row for row, which is
    * what q131 hash-checks. Production at scale runs `false`: the
    * whole point is not to enumerate the clique. */
  def phashNearDupPairsCapped(sigs: DataFrame, maxDist: Int = 6,
                              maxBucketIds: Int = 2,
                              includeOverflow: Boolean = true): DataFrame = {
    require(maxDist <= 7, s"8x8 banding is exact only to distance 7, got $maxDist")
    import org.apache.spark.sql.expressions.Window
    val banded = sigs.select(col("media_id"), col("ph_hi"), col("ph_lo"),
        explode(array((0 until 8).map(lit): _*)).as("k"))
      .withColumn("band",
        expr("shiftright(IF(k < 4, ph_lo, ph_hi), (k % 4) * 8)")
          .bitwiseAND(lit(255L)))
    // rn <= M filters plan two-phase WindowGroupLimit (q118): map-side
    // partial keeps <= M rows per (k, band) per partition BEFORE the
    // exchange, so a saturated bucket never ships its clique
    val ranked = banded.withColumn("rn",
      row_number().over(Window.partitionBy(col("k"), col("band"))
        .orderBy(col("media_id"))))
    val store = if (includeOverflow) ranked.localCheckpoint(true) else ranked
    val kept = store.filter(col("rn") <= maxBucketIds)
    def sides(df: DataFrame, a: String, b: String) = (
      df.select(col("k"), col("band"), col("media_id").as(a),
        col("ph_hi").as(s"hi_$a"), col("ph_lo").as(s"lo_$a")),
      df.select(col("k"), col("band"), col("media_id").as(b),
        col("ph_hi").as(s"hi_$b"), col("ph_lo").as(s"lo_$b")))
    val (kl, kr) = sides(kept, "d1", "d2")
    val capped = kl.join(kr, Seq("k", "band")).filter(col("d1") < col("d2"))
      .withColumn("hamming",
        (bit_count(expr("hi_d1 ^ hi_d2")) + bit_count(expr("lo_d1 ^ lo_d2"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming")).distinct()
    if (!includeOverflow) capped.withColumn("via", lit("capped"))
    else {
      // diverted members probe their FULL buckets; least/greatest
      // canonicalizes because a diverted id sits on either side
      val over = store.filter(col("rn") > maxBucketIds)
        .select(col("k"), col("band"), col("media_id").as("da"),
          col("ph_hi").as("ha"), col("ph_lo").as("la"))
        .join(store.select(col("k"), col("band"), col("media_id").as("db"),
          col("ph_hi").as("hb"), col("ph_lo").as("lb")), Seq("k", "band"))
        .filter(col("da") =!= col("db"))
        .withColumn("hamming",
          (bit_count(expr("ha ^ hb")) + bit_count(expr("la ^ lb"))).cast("long"))
        .filter(col("hamming") <= maxDist)
        .select(least(col("da"), col("db")).as("d1"),
          greatest(col("da"), col("db")).as("d2"), col("hamming")).distinct()
      capped.withColumn("via", lit("capped"))
        .unionByName(over.join(capped.select("d1", "d2"), Seq("d1", "d2"), "left_anti")
          .withColumn("via", lit("overflow")))
    }
  }

  /** Perceptual-hash near-dup pairs with Hamming distance ≤ `maxDist`
    * — the image face of the SimHash band machinery
    * (DedupOps.simhashPairs): 8 bands of 8 bits over the 64-bit
    * signature, candidates = pairs sharing any (band-index, band
    * value) bucket, Hamming verify on the full signature. Pigeonhole
    * makes this EXACT for maxDist ≤ 7 (8 bands, ≤7 flipped bits ⇒
    * one band survives intact), so output equals the all-pairs
    * spelling while the join touches n/256 of each band space —
    * never a cross join.
    *
    * Scale: per-(k, band) bucket load is the class-collision rate,
    * not corpus size; a pathological single-class corpus degrades to
    * its clique output — which IS the answer, not a blow-up. The
    * Hamming filter runs BEFORE the dedup shuffle (the simhashPairs
    * lesson: it drops ~99.9% of banded candidates, so distinct
    * shuffles thousands of rows, not millions). */
  def phashNearDupPairs(sigs: DataFrame, maxDist: Int = 6): DataFrame = {
    require(maxDist <= 7, s"8x8 banding is exact only to distance 7, got $maxDist")
    phashPairsFromStore(phashBandRows(sigs), maxDist)
  }

  /** Banded signature rows (k, band, media_id, ph_hi, ph_lo) — the
    * persisted-artifact face of the image near-dup index, the media
    * sibling of `DedupOps.minhashBandStore`: a nightly job writes
    * these (bucketed by (k, band) at scale) and incremental
    * ingestion probes them instead of re-banding the corpus. */
  def phashBandRows(sigs: DataFrame): DataFrame =
    sigs.select(col("media_id"), col("ph_hi"), col("ph_lo"),
        explode(array((0 until 8).map(lit): _*)).as("k"))
      .withColumn("band",
        expr("shiftright(IF(k < 4, ph_lo, ph_hi), (k % 4) * 8)")
          .bitwiseAND(lit(255L)))

  /** Near-dup pairs read from an already-materialized band store —
    * signatures are NOT recomputed. phashNearDupPairs ≡ this over
    * phashBandRows. */
  def phashPairsFromStore(store: DataFrame, maxDist: Int = 6): DataFrame = {
    val l = store.select(col("k"), col("band"), col("media_id").as("d1"),
      col("ph_hi").as("hi1"), col("ph_lo").as("lo1"))
    val r = store.select(col("k"), col("band"), col("media_id").as("d2"),
      col("ph_hi").as("hi2"), col("ph_lo").as("lo2"))
    l.join(r, Seq("k", "band")).filter(col("d1") < col("d2"))
      .withColumn("hamming",
        (bit_count(expr("hi1 ^ hi2")) + bit_count(expr("lo1 ^ lo2"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming"))
      .distinct()
  }

  /** O(Δ) incremental arrival against a persisted band store — the
    * q97/q102 contract on the image face: only the DELTA's signatures
    * band (the store is read, not recomputed), every emitted pair has
    * a delta member, and storePairs ∪ incremental ≡ the full batch
    * recompute (q133 hash-checks that identity against the SAME
    * oracle as q125). The delta probes store ∪ delta, so delta×delta
    * pairs surface too; least/greatest canonicalizes because a delta
    * id sits on either side of a stored partner. Per-arrival cost is
    * the probed buckets' membership — the streaming twin
    * ([[graft.streaming.HammingStream]]) holds the same state
    * sharded by (band, value). */
  def incrementalPhashPairs(store: DataFrame, deltaSigs: DataFrame,
                            maxDist: Int = 6): DataFrame = {
    val db = phashBandRows(deltaSigs)
    val l = db.select(col("k"), col("band"), col("media_id").as("da"),
      col("ph_hi").as("ha"), col("ph_lo").as("la"))
    val r = store.unionByName(db)
      .select(col("k"), col("band"), col("media_id").as("db"),
        col("ph_hi").as("hb"), col("ph_lo").as("lb"))
    l.join(r, Seq("k", "band")).filter(col("da") =!= col("db"))
      .withColumn("hamming",
        (bit_count(expr("ha ^ hb")) + bit_count(expr("la ^ lb"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"), col("hamming"))
      .distinct()
  }
}
