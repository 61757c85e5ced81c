package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.UrlOps

/** The URL family's CONTINUOUS face (q186's batch `urlCurate` is the
  * nightly one): arriving crawl URLs canonicalize map-side (the SAME
  * `UrlOps` Column expressions — structural batch/stream parity, the
  * qualityBattery rule), then two chained keyed-state stages in one
  * query:
  *
  *  1. canonical-URL DEDUP — first arrival of a canonical URL is its
  *     keeper (one 8-byte state value per unique canonical URL);
  *     replays and later copies emit nothing;
  *  2. per-DOMAIN CAP — at most `cap` keepers admitted per domain,
  *     one counter per domain forever. Domains are an OPEN set (a
  *     crawl discovers them), so this is its own keyed state rather
  *     than QuotaStream's allowlist-table contract.
  *
  * The cap sits BELOW the dedup exactly like curatedAdmittedStream's
  * quota-below-dedup ordering: at-least-once re-offers are absorbed
  * by stage 1 before anything counts against a domain budget, so
  * first-N admission is replay-safe by construction.
  *
  * Election semantics vs batch: the batch operator elects the min-id
  * copy per canonical URL and caps in (sha-bucket, id) order — a
  * global decision. The stream admits FIRST-ARRIVAL keepers in
  * arrival order (within a batch, lowest id first for determinism) —
  * the only decision a single pass over an unbounded stream can
  * make. The parity spec therefore pins the set-level invariants
  * (admitted canonical set ⊆ batch keeper canonical set; per-domain
  * counts = min(cap, keepers); exactly-once across replays), not
  * member identity.
  */
object UrlStream {

  final case class UrlDoc(doc_id: Long, url: String)
  final case class Curated(doc_id: Long, canon: String, domain: String)
  /** Persisted schemas (checkpoint compatibility — the FpState rule). */
  final case class KeeperState(keeper: Long, ver: Int = 1)
  final case class CapState(admitted: Long, ver: Int = 1)
  final case class Admitted(doc_id: Long, canon: String, domain: String, seq: Long)

  def urlCuratedAdmitted(urls: Dataset[UrlDoc], cap: Long): Dataset[Admitted] = {
    require(cap >= 1, s"urlCuratedAdmitted: cap must be >= 1, got $cap")
    import urls.sparkSession.implicits._
    val canoned = urls.toDF()
      .withColumn("canon", UrlOps.canonicalizeUrl(col("url")))
      .withColumn("domain", UrlOps.urlDomain(col("canon")))
      .select(col("doc_id"), col("canon"), col("domain")).as[Curated]
    val keepers = canoned.groupByKey(_.canon)
      .flatMapGroupsWithState[KeeperState, Curated](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[KeeperState]) =>
          if (state.exists) Iterator.empty // keeper already elected
          else {
            val first = it.minBy(_.doc_id) // in-batch determinism
            state.update(KeeperState(first.doc_id))
            Iterator.single(first)
          }
      }
    keepers.groupByKey(_.domain)
      .flatMapGroupsWithState[CapState, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (domain, it, state: GroupState[CapState]) =>
          var n = state.getOption.map(_.admitted).getOrElse(0L)
          val out = scala.collection.mutable.ListBuffer.empty[Admitted]
          it.toSeq.sortBy(_.doc_id).foreach { k =>
            if (n < cap) { n += 1; out += Admitted(k.doc_id, k.canon, k.domain, n) }
          }
          state.update(CapState(n))
          out.iterator
      }
  }
}
