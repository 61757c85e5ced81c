package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.analytics.DedupOps

/** Streaming near-dup detection: the q97 incremental band-store
  * contract as a CONTINUOUS stream instead of a nightly batch.
  * Documents arrive; each one's LSH band rows probe a per-bucket state
  * store that holds the ids already seen in that bucket; candidate
  * pairs emit the moment the second member arrives. State is the band
  * store itself — the same (k, bv) → ids structure a nightly pipeline
  * persists (DedupOps.bandRows scaladoc), kept by the streaming state
  * backend instead of a table.
  *
  * Emission is at-least-once per SHARED BAND: a pair agreeing on two
  * bands emits from both buckets (buckets are independent state
  * groups; cross-group dedup would need a second stateful stage).
  * Downstream, `dropDuplicates` — or the exact-Jaccard verify in a
  * foreachBatch, which is idempotent — absorbs the duplicates, the
  * same trade statefulDedupTtl documents for TTL replays.
  */
object DedupStream {

  final case class Doc(doc_id: Long, text: String)
  final case class BandRow(k: Int, bv: String, doc_id: Long)
  final case class CandidatePair(d1: Long, d2: Long)
  /** `ids` is the bucket's member set (encoded as a list; membership
    * checks go through a Set built per invocation — a hot bucket must
    * not pay O(n) per probe). `saturated` latches once the bucket
    * exceeds the size cap: a saturated bucket is the streaming analog
    * of a q79 stop-shingle — boilerplate, not near-dup signal — so it
    * stops pairing AND stops growing (bounded state).
    *
    * CHECKPOINT COMPATIBILITY: this case class IS the persisted state
    * schema. flatMapGroupsWithState state rows written under an older
    * shape (e.g. pre-`saturated`) do not decode with the new encoder —
    * restarting an existing checkpoint across such a change fails on
    * the first batch instead of resuming. Changing these fields means
    * a fresh checkpoint dir + state rebuild from the band store (the
    * batch twin regenerates it); do not evolve the schema in place.
    *
    * `ver` is the state-schema version (this shape = 1). It is the
    * LAST breaking addition: future field additions bump `ver`, keep
    * the old fields in place, and branch on the decoded version to
    * migrate old rows instead of forcing a checkpoint rebuild. */
  final case class BucketState(ids: List[Long], saturated: Boolean,
                               ver: Int = 1)

  /** The LSH band rows of one document as plain Scala — bit-equal to
    * the batch pipeline (shingleSet → minhashSignatures → withBands →
    * bandRows; StreamingSpec pins the parity on the corpus): distinct
    * 3-token shingles, one sha-256 base hash per shingle, the
    * MINHASH_A/B universal family mod MINHASH_PRIME, minima folded
    * per hash, 4 bands of 4 minima joined with '|'. Documents with
    * fewer than 3 tokens have no shingles, hence no band rows —
    * exactly the batch behavior. */
  def bandRowsOf(docId: Long, text: String, n: Int = 3): Seq[BandRow] = {
    if (text == null) return Nil
    // the shared gram loop: bit-equality with the batch shingle set
    // is structural (graft.functions.ShingleExplode.distinctShingles)
    val shingles = graft.functions.ShingleExplode.distinctShingles(text, n)
    if (shingles.isEmpty) return Nil
    val mins = Array.fill(DedupOps.MINHASH_K)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val it = shingles.iterator()
    while (it.hasNext) {
      val digest = md.digest(it.next().getBytes("UTF-8"))
      // first 8 hex chars = first 4 bytes, unsigned (batch: conv(substring(sha2,1,8),16,10))
      val h = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      var q = 0
      while (q < DedupOps.MINHASH_K) {
        val v = (DedupOps.MINHASH_A(q) * h + DedupOps.MINHASH_B(q)) % DedupOps.MINHASH_PRIME
        if (v < mins(q)) mins(q) = v
        q += 1
      }
    }
    val rows = DedupOps.MINHASH_K / DedupOps.MINHASH_BANDS
    (0 until DedupOps.MINHASH_BANDS).map { b =>
      BandRow(b, (0 until rows).map(r => mins(b * rows + r)).mkString("|"), docId)
    }
  }

  /** Candidate near-dup pairs over a document stream. Pairs are
    * canonical (d1 < d2) and each pairs a NEW document with a stored
    * or same-batch one — the O(delta) property: an arriving document
    * costs its own band probes, never a corpus rescan. Verify exactly
    * as in batch: feed the candidates to DedupOps-style Jaccard in a
    * foreachBatch against the document store.
    *
    * `maxBucketIds` bounds per-bucket state and emission: a bucket
    * that would grow past the cap emits the pairs for the documents
    * that still fit, then SATURATES — further members neither pair nor
    * store (state stays bounded; a hot boilerplate band would
    * otherwise degrade to O(n²) pairs per batch with unbounded state,
    * the adversarial case the batch path caps with the q79 df cap).
    * Saturated-bucket members are boilerplate-removal candidates, not
    * near-dup signal, and genuine near-dups still meet through their
    * other MINHASH_BANDS-1 buckets. Default Int.MaxValue = uncapped. */
  def streamingNearDupCandidates(docs: Dataset[Doc],
                                 maxBucketIds: Int = Int.MaxValue): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    streamingNearDupCandidatesOps(
      docs.map(d => DocOp(d.doc_id, d.text, drop = false)), maxBucketIds)
  }

  /** An incremental dedup event: a document arrival (`drop = false`)
    * or a compaction drop (`drop = true`) — the streaming analog of
    * [[graft.analytics.DedupOps.compactBandStore]]'s non-keeper list.
    * A drop event carries the document's TEXT so its band rows route
    * it to exactly the buckets holding it (the compactor reads
    * non-keeper docs from the corpus store, so the text is at hand —
    * q103/q108's nightly flow). */
  final case class DocOp(doc_id: Long, text: String, drop: Boolean)
  final case class BandOpRow(k: Int, bv: String, doc_id: Long, drop: Boolean)

  /** [[streamingNearDupCandidates]] with in-stream state compaction:
    * drop events evict their ids from bucket state, so future
    * arrivals pair against keepers only — sound for the same reason
    * compactBandStore is (a new near-dup of a dropped doc is near-dup
    * to the dropped doc's keeper by cluster transitivity). Within a
    * mixed batch, drops apply FIRST and a same-batch (drop, re-add)
    * of one id resolves to dropped — in practice a compaction batch
    * runs between ingest batches, exactly like the nightly GC.
    * Buckets whose last member is evicted REMOVE their state row
    * (observable as a shrinking numRowsTotal in the query progress);
    * a saturated bucket keeps its row even when emptied — the latch
    * is boilerplate signal and must survive compaction. */
  def streamingNearDupCandidatesOps(ops: Dataset[DocOp],
                                    maxBucketIds: Int = Int.MaxValue): Dataset[CandidatePair] = {
    import ops.sparkSession.implicits._
    ops.flatMap(o => bandRowsOf(o.doc_id, o.text)
        .map(r => BandOpRow(r.k, r.bv, r.doc_id, o.drop)))
      .groupByKey(r => (r.k, r.bv))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, String), rows: Iterator[BandOpRow], state: GroupState[BucketState]) => {
          val prev = state.getOption.getOrElse(BucketState(Nil, saturated = false))
          val rs = rows.toSeq
          val dropped = rs.iterator.filter(_.drop).map(_.doc_id).toSet
          val stored = prev.ids.filterNot(dropped)
          val storedSet = stored.toSet // O(1) membership for hot buckets
          // deterministic emission order within a batch
          val fresh = rs.iterator.filterNot(_.drop).map(_.doc_id).toSeq.distinct
            .filterNot(id => storedSet.contains(id) || dropped.contains(id))
            .sorted
          val out = scala.collection.mutable.ListBuffer.empty[CandidatePair]
          var known = stored
          var n = stored.size
          var saturated = prev.saturated
          fresh.foreach { id =>
            if (!saturated && n >= maxBucketIds) saturated = true
            if (!saturated) {
              known.foreach { o =>
                if (o != id) out += CandidatePair(math.min(id, o), math.max(id, o))
              }
              known = id :: known
              n += 1
            }
          }
          if (known.isEmpty && !saturated) state.remove()
          else state.update(BucketState(known, saturated))
          out.iterator
        })
  }
}
