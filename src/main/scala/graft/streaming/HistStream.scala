package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming log₂-histogram — `analytics/LogHist`'s continuous twin,
  * completing the quantile-sketch family's batch/stream matrix the
  * way KmvStream does the cardinality family's.
  *
  * Shape per the DriftStream rule: running bucket counts are a
  * streaming AGGREGATION (`groupBy(scope, bin).count()` — map-side
  * combine and checkpointed state come free; a constant-key or
  * hand-rolled state machine would funnel rows and re-implement what
  * the engine already does), emitted in Update mode — one row per
  * touched (scope, bin) per micro-batch. A consumer keeps the latest
  * row per (scope, bin) and feeds the rows to
  * [[graft.analytics.LogHist.quantiles]] — the ONE estimator
  * spelling — for a continuously updated quantile gauge with the
  * batch operator's exact factor-2 envelope. The bucket expression
  * is [[graft.analytics.LogHist.bucket]] itself, so stream≡batch
  * bucket parity is structural, not disciplined.
  *
  * State is bounded by construction: one long per (scope, bin),
  * ≤ 64 bins per scope FOREVER (the bit-length domain) — the sketch
  * is its own cap, no TTL or latch needed. The use: live token-count
  * / document-size quantiles per source over an ingest stream, the
  * monitoring face of q181's nightly rollup.
  */
object HistStream {

  final case class Arrival(scope: String, v: Long)

  /** Running (scope, bin, cnt) rows in Update mode — bit-equal to
    * `LogHist.sketch` over everything that has arrived. */
  def runningSketch(arrivals: Dataset[Arrival]): DataFrame =
    arrivals.toDF()
      .select(col("scope"), graft.analytics.LogHist.bucket(col("v")).as("bin"))
      .groupBy(col("scope"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
}
