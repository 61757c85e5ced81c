package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor — q165's continuous twin:
  * the ingest stream's RUNNING feature distribution (one pre-
  * projected bin per arrival: lang, source, length bucket) tested
  * each micro-batch against a REFERENCE distribution (yesterday's
  * corpus mixture, the training recipe, a contract) with the
  * goodness-of-fit chi-square χ² = Σ (o_b − N·p_b)²/(N·p_b) and
  * q165's effect-size verdict φ² = χ²/N > threshold — the alarm a
  * 100 TB ingest wants the moment a crawler starts delivering a
  * different mixture, not at tomorrow's batch audit.
  *
  * Deliberately NOT a custom state machine: a constant-key
  * flatMapGroupsWithState would funnel every arrival to one task,
  * and a bin-keyed one would shuffle raw rows with no combine. The
  * running counts ARE a streaming aggregation, and Spark's own
  * `groupBy(bin).count()` gets map-side partial aggregation and
  * checkpointed state for free — so the operator is that
  * aggregation plus the verdict assembly over its |bins|-row
  * output ([[verdictOf]], shared with any batch twin — the
  * qualityBattery one-spelling rule). Bins absent from the
  * reference are excluded from χ² (a p = 0 term would divide by
  * zero, and killing the query on unseen data is the wrong failure
  * mode for a monitor) but their MASS IS PART OF THE ALARM: the
  * verdict also fires when unknown-bin arrivals exceed
  * `unknownFrac` of all traffic — otherwise the strongest drift of
  * all (the crawler moves to bins the reference has never seen)
  * would read χ² ≈ 0 and never flag. */
object DriftStream {

  final case class Arrival(bin: String)
  final case class Verdict(n_total: Long, n_unknown: Long, chi2: Double,
                           drift: Boolean)

  /** The one spelling of the statistic for stream AND batch:
    * χ² over reference bins from exact counts. */
  def chiSquare(counts: Map[String, Long], reference: Map[String, Double]): Double = {
    val n = reference.keys.map(b => counts.getOrElse(b, 0L)).sum.toDouble
    if (n == 0) 0.0
    else reference.foldLeft(0.0) { case (acc, (b, p)) =>
      val e = n * p
      val d = counts.getOrElse(b, 0L).toDouble - e
      acc + d * d / e
    }
  }

  /** Verdict from a (bin, cnt) count frame (the streaming agg's
    * complete-mode table, or any batch groupBy). Fires on EITHER
    * signal: in-reference mixture shift (φ² = χ²/N > phi2Threshold)
    * or unknown-bin mass above `unknownFrac` of all arrivals — the
    * two ways an ingest mixture goes wrong. */
  def verdictOf(counts: Map[String, Long], reference: Map[String, Double],
                phi2Threshold: Double = 0.01,
                unknownFrac: Double = 0.01): Verdict = {
    require(reference.nonEmpty && reference.values.forall(_ > 0.0),
      "reference proportions must be positive")
    val known = counts.view.filterKeys(reference.contains).toMap
    val nUnknown = counts.view.filterKeys(!reference.contains(_)).values.sum
    val n = known.values.sum
    val chi2 = chiSquare(known, reference)
    Verdict(n, nUnknown, chi2,
      chi2 > phi2Threshold * n ||
        nUnknown.toDouble > unknownFrac * (n + nUnknown))
  }

  /** The running bin-count aggregation over an arrival stream —
    * Spark streaming agg state, map-side combined; read it back per
    * batch (complete/update mode) and assemble [[verdictOf]]. */
  def runningCounts(arrivals: Dataset[Arrival]): DataFrame =
    arrivals.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
}
