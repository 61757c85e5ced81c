package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-dup detection over BANDED HAMMING SIGNATURES — the
  * generic twin that gives every fixed-width-signature family its
  * continuous spelling in one operator: image perceptual hashes
  * (`Multimodal.phashNearDupPairs`, 8×8 bands), acoustic fingerprints
  * (`Multimodal.audioNearDupPairs`, 4×8), and SimHash
  * (`DedupOps.simhashPairs`, 4×8) differ only in (nBands,
  * bitsPerBand, maxDist) — so unlike [[DedupStream]] (MinHash band
  * rows + deferred Jaccard verify) and [[EmbedStream]] (Hamming-ball
  * probing + cosine verify), the state machine here is shared across
  * modalities.
  *
  * Signature container: two longs (hi, lo) = one 128-bit word, bit j
  * in lo for j < 64. A 64-bit aHash packs as lo = ph_lo | ph_hi << 32
  * (xor/bit_count are split-invariant, so Hamming distances are
  * bit-equal to the batch two-word spelling); a 32-bit fingerprint is
  * just lo.
  *
  * Exactly-once pair emission WITHOUT a distinct shuffle — the batch
  * operators `.distinct()` because a pair sharing m bands meets in m
  * buckets; a stream cannot reconcile across buckets afterwards.
  * Here it doesn't need to: each bucket holds the FULL signatures of
  * both members, so every shared band index is locally computable,
  * and the pair emits only in its LOWEST shared band's bucket. Clean
  * runs emit each qualifying pair exactly once; replayed
  * micro-batches can re-emit pairs whose stored side predates the
  * replay boundary (at-least-once, absorbed by an idempotent sink —
  * the family contract).
  *
  * Scale: state shards by (band-index, band-value) — n/2^bitsPerBand
  * expected bucket load; an arrival costs nBands bucket visits, each
  * a scan of that bucket's members. `maxBucketIds` is the saturation
  * latch of the other twins: a bucket past the cap is a
  * mass-duplicate signal that stops pairing AND growing.
  *
  * CHECKPOINT COMPATIBILITY: [[HammingStream.BucketState]] is the
  * persisted schema; bump `ver` and migrate on change. */
object HammingStream {

  final case class Sig(media_id: Long, hi: Long, lo: Long)
  final case class BandRow(bucket: String, k: Int, media_id: Long,
                           hi: Long, lo: Long)
  final case class Member(id: Long, hi: Long, lo: Long)
  final case class BucketState(members: List[Member], saturated: Boolean,
                               ver: Int = 1)
  final case class Pair(d1: Long, d2: Long, hamming: Long)

  /** Band `k` of the 128-bit (hi, lo) signature. Bands must not
    * straddle the 64-bit word boundary (bitsPerBand dividing 64
    * guarantees it). */
  def bandOf(hi: Long, lo: Long, k: Int, bitsPerBand: Int): Long = {
    val off = k * bitsPerBand
    val word = if (off < 64) lo else hi
    (word >>> (off % 64)) & ((1L << bitsPerBand) - 1)
  }

  def hamming(a: Member, bHi: Long, bLo: Long): Int =
    java.lang.Long.bitCount(a.hi ^ bHi) + java.lang.Long.bitCount(a.lo ^ bLo)

  /** First band index two signatures share, -1 if none. */
  private def firstSharedBand(hi1: Long, lo1: Long, hi2: Long, lo2: Long,
                              nBands: Int, bitsPerBand: Int): Int = {
    var k = 0
    while (k < nBands) {
      if (bandOf(hi1, lo1, k, bitsPerBand) == bandOf(hi2, lo2, k, bitsPerBand))
        return k
      k += 1
    }
    -1
  }

  /** Verified near-dup pairs over a signature stream: canonical
    * (d1 < d2), Hamming ≤ maxDist, exact by pigeonhole when
    * (nBands − 1) · bitsPerBand covers maxDist flips (maxDist <
    * nBands ⇒ some band survives intact). Output over all batches ≡
    * the batch banded operator over the union of arrivals
    * (StreamingSpec pins it for the image and audio instantiations,
    * Hamming values included). */
  def streamingNearDupPairs(sigs: Dataset[Sig], nBands: Int,
                            bitsPerBand: Int, maxDist: Int,
                            maxBucketIds: Int = Int.MaxValue): Dataset[Pair] = {
    require(nBands * bitsPerBand <= 128, s"$nBands x $bitsPerBand exceeds the 128-bit container")
    require(bitsPerBand > 0 && 64 % bitsPerBand == 0,
      s"bands must not straddle the 64-bit word boundary: bitsPerBand=$bitsPerBand")
    require(maxDist < nBands,
      s"pigeonhole exactness needs maxDist < nBands, got $maxDist vs $nBands")
    import sigs.sparkSession.implicits._
    sigs.flatMap { s =>
      (0 until nBands).map { k =>
        BandRow(s"$k:${bandOf(s.hi, s.lo, k, bitsPerBand)}", k,
          s.media_id, s.hi, s.lo)
      }
    }
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[BandRow], state: GroupState[BucketState]) => {
          val prev = state.getOption.getOrElse(BucketState(Nil, saturated = false))
          var saturated = prev.saturated
          var members = prev.members
          val known = scala.collection.mutable.Set.from(members.iterator.map(_.id))
          val out = scala.collection.mutable.ListBuffer.empty[Pair]
          // sorted-id order: same-batch pairs form exactly once (the
          // larger id arrives "later" and pairs against the smaller)
          val arrivals = rows.toSeq
          val myBand = arrivals.head.k
          arrivals.groupBy(_.media_id).toSeq.map(_._2.head).sortBy(_.media_id)
            .foreach { r =>
              if (!known.contains(r.media_id)) {
                if (!saturated && members.size >= maxBucketIds) saturated = true
                if (!saturated) {
                  members.foreach { m =>
                    if (m.id != r.media_id) {
                      val d = hamming(m, r.hi, r.lo)
                      // emit ONLY in the pair's lowest shared band —
                      // both signatures are fully known here, so the
                      // dedup the batch operator does with distinct()
                      // is a local decision
                      if (d <= maxDist && firstSharedBand(m.hi, m.lo,
                          r.hi, r.lo, nBands, bitsPerBand) == myBand)
                        out += Pair(math.min(m.id, r.media_id),
                          math.max(m.id, r.media_id), d.toLong)
                    }
                  }
                  members = Member(r.media_id, r.hi, r.lo) :: members
                  known += r.media_id
                }
              }
            }
          if (members.isEmpty && !saturated) state.remove()
          else state.update(BucketState(members, saturated))
          out.iterator
        })
  }
}
