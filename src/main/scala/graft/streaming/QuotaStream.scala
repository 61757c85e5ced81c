package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source admission quotas — the mixture family's
  * continuous face (q130 balanced / q169 temperature targets applied
  * AT INGEST): each source admits its first `target` arrivals and
  * rejects the rest, so the nightly mixture is enforced while the
  * data streams in instead of by a downsampling pass after landing.
  * Targets come from the batch mixture operators run on yesterday's
  * counts (`Mixture.balancedSample`/`temperatureSample` rate
  * tables) — the lifecycle every family here follows: batch op
  * computes the model, stream enforces it.
  *
  * Contract (the CurationStream arrival-order rule): admission is
  * FIRST-ARRIVAL-WINS — which docs are admitted depends on arrival
  * order, but the per-source admitted COUNT min(target, arrivals)
  * does not. State is ONE long per source, forever. Clean runs admit
  * each arrival at most once; replayed micro-batches re-offer rows,
  * so quota admission belongs downstream of the exact-dedup stage
  * (CurationStream), which absorbs replays — same at-least-once
  * posture as the rest of the family.
  *
  * CHECKPOINT COMPATIBILITY: [[QuotaStream.QuotaState]] is the
  * persisted schema; bump `ver` and migrate on change. */
object QuotaStream {

  final case class Arrival(source: String, doc_id: Long)
  final case class QuotaState(admitted: Long, ver: Int = 1)
  final case class Admitted(source: String, doc_id: Long, seq: Long)

  /** Admit up to targets(source) arrivals per source; sources absent
    * from `targets` are rejected entirely (an allowlist — the
    * mixture table IS the source registry). `seq` is the per-source
    * admission index (1-based), monotone across batches. */
  def admitted(arrivals: Dataset[Arrival],
               targets: Map[String, Long]): Dataset[Admitted] = {
    import arrivals.sparkSession.implicits._
    arrivals.groupByKey(_.source)
      .flatMapGroupsWithState[QuotaState, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (source, it, state: GroupState[QuotaState]) =>
          val target = targets.getOrElse(source, 0L)
          var n = state.getOption.map(_.admitted).getOrElse(0L)
          val out = scala.collection.mutable.ListBuffer.empty[Admitted]
          it.foreach { a =>
            if (n < target) { n += 1; out += Admitted(source, a.doc_id, n) }
          }
          state.update(QuotaState(n))
          out.iterator
      }
  }
}
