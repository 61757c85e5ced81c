package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV distinct-cardinality monitor — `analytics/Kmv`'s
  * continuous twin, completing the sketch family's matrix the way
  * every dedup family has one. min-K is ASSOCIATIVE, so the
  * per-scope state is the sketch itself: merging a micro-batch's
  * arrival hashes into the stored bottom-K list is exactly the
  * partial-aggregation step the batch operator's WindowGroupLimit
  * performs map-side — the stream and the batch compute the same
  * k-row object by construction, which is what the parity spec
  * pins (state list ≡ `Kmv.sketch` h-column, estimate ≡
  * `Kmv.estimate`, across drops AND a checkpoint restart).
  *
  * The use: a continuously-updating "distinct tokens/urls/users per
  * source" gauge over an ingest stream, servable per micro-batch
  * from K longs of state per scope — where the exact answer needs
  * unbounded distinct state. Emission is one row per scope per
  * batch in Update mode; `n_total` (rows ever observed) is monotone
  * and orders emissions for a consumer that keeps only the latest.
  *
  * State is bounded: K longs + a counter per scope, forever —
  * saturation needs no cap/latch (the sketch IS the cap).
  *
  * CHECKPOINT COMPATIBILITY: [[KmvStream.SketchState]] is the
  * persisted schema; bump `ver` and migrate on change. */
object KmvStream {

  final case class Arrival(scope: String, elem: String)
  final case class SketchState(hs: List[Long], nTotal: Long, ver: Int = 1)
  final case class Estimate(scope: String, hs: Seq[Long], n_total: Long,
                            n_seen: Long, est: Long)

  val K: Int = graft.analytics.Kmv.K

  /** Bit-equal to [[graft.analytics.Kmv.hash48]]: the first 12
    * sha-256 hex nibbles are the first 6 digest bytes. */
  def hash48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  /** Same estimator as Kmv.estimate: exact below K, (K−1)·2^48 div
    * kth at K (hs sorted ascending, so kth = last). */
  def estimateOf(hs: List[Long]): Long =
    if (hs.size < K) hs.size.toLong
    else graft.analytics.Kmv.EST_NUM / hs.last

  /** Per-scope bottom-K maintenance over an arrival stream. The
    * merge is a BOUNDED FOLD over the arrival iterator — a K-capped
    * sorted set, never a batch-sized list — so processing memory is
    * O(K) per scope even when a backfill delivers a whole corpus in
    * one micro-batch (the AvailableNow shape): an arrival past a
    * full set's max is dropped in O(log K) without materializing
    * anything. */
  def sketches(arrivals: Dataset[Arrival]): Dataset[Estimate] = {
    import arrivals.sparkSession.implicits._
    arrivals.groupByKey(_.scope)
      .flatMapGroupsWithState[SketchState, Estimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (scope, it, state: GroupState[SketchState]) =>
          val prev = state.getOption
          var n = prev.map(_.nTotal).getOrElse(0L)
          val set = new java.util.TreeSet[java.lang.Long]()
          prev.foreach(_.hs.foreach(h => set.add(h)))
          it.foreach { a =>
            n += 1
            val h = hash48(a.elem)
            if (set.size < K) set.add(h)
            else if (h < set.last) { if (set.add(h)) set.pollLast() }
          }
          import scala.jdk.CollectionConverters._
          val merged = set.iterator().asScala.map(_.longValue).toList
          state.update(SketchState(merged, n))
          Iterator.single(Estimate(scope, merged, n,
            merged.size.toLong, estimateOf(merged)))
      }
  }
}
