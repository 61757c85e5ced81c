package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact selection — the scale path for exact per-group
  * quantiles when the sketch (q38) won't do and the per-group sort
  * (q54/q69: every group's full row set through one window task) is
  * the bottleneck.
  *
  * Histogram narrowing, two phases over the data:
  *   0. per-group (min, max, count) — one partial-agg shuffle;
  *   1. per-(group, bin) counts over `nBins` equal-width value bins —
  *      partial-agg shuffle of ≤ |groups|·nBins rows; a window over
  *      that TINY frame finds each rank's target bin (where the
  *      cumulative count crosses the target rank) and the residual
  *      local rank within it;
  *   2. rows of the target bins only — expected n/nBins per group —
  *      are ranked by (value, tiebreak) per (group, bin) and the
  *      residual rank picked.
  *
  * Every shuffle is bounded by |groups|·nBins or the residual bin
  * population; no group's full row set is ever sorted in one task —
  * in particular there is NO partition-less Window anywhere (q141's
  * PlanSpec assert). Equal values always share a bin, so the
  * (value, tiebreak) order within the target bin agrees with the
  * global order — the selected element is exactly the window
  * formulation's rn = rank row (DistributedSelectSpec proves
  * equality; q87 proves it against the DuckDB oracle). Degenerate
  * case: a single value dominating a group concentrates its bin
  * (all-equal groups degrade to the plain sort) — one recursion
  * level on the bin would bound that too; not needed at current
  * skew.
  */
object DistributedSelect {

  /** Exact element at arbitrary ranks per group — several named
    * ranks served by ONE histogram pass (q141 takes p50 and p99
    * together). Each entry maps the group's row count `n` to a
    * 1-based target rank under (value asc, tiebreak asc); ranks
    * must land in [1, n]. Output: (groupCol, rank_name, value) —
    * value as double (the binning domain). */
  def groupRankSelect(df: DataFrame, groupCol: String, valueCol: String,
                      tieCol: String, ranks: Seq[(String, Column => Column)],
                      nBins: Int = 1024): DataFrame = {
    require(ranks.nonEmpty, "groupRankSelect: at least one rank")
    val base = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"), col(tieCol).as("t"))
    // Non-finite-safe: range stats cover FINITE values only (a NaN or
    // ±Inf hi/lo would poison every row's bin arithmetic — Inf/Inf is
    // NaN and the ANSI cast of floor(NaN) throws). Non-finite rows get
    // explicit bins mirroring Spark's ascending sort order
    //   null < -Inf < finite < +Inf < NaN
    // (nulls first, NaN greatest): null → -2, -Inf → -1, finite →
    // 0..nBins-1, +Inf → nBins, NaN → nBins+1 — so within-bin (v, t)
    // ranking still agrees with the global window order.
    val finite = !isnan(col("v")) && abs(col("v")) =!= Double.PositiveInfinity
    val stats = base.groupBy(col("g"))
      .agg(min(when(finite, col("v"))).as("lo"),
        max(when(finite, col("v"))).as("hi"),
        count(lit(1)).as("n"))
    val binned = base.join(broadcast(stats), Seq("g"))
      .withColumn("bin",
        when(col("v").isNull, lit(-2))
          .when(col("v") === Double.NegativeInfinity, lit(-1))
          .when(isnan(col("v")), lit(nBins + 1))
          .when(col("v") === Double.PositiveInfinity, lit(nBins))
          .when(col("hi").isNull || col("hi") === col("lo"), lit(0))
          .otherwise(
            least(floor((col("v") - col("lo")) / (col("hi") - col("lo")) * nBins),
              lit(nBins - 1))).cast("int"))
    // one (g, rname, rank) row per requested rank — |groups|·|ranks|
    val rankRows = stats.select(col("g"), explode(array(ranks.map {
      case (nm, f) => struct(lit(nm).as("rname"), f(col("n")).cast("long").as("rank"))
    }: _*)).as("r")).select(col("g"), col("r.rname").as("rname"), col("r.rank").as("rank"))
    val wBin = Window.partitionBy(col("g")).orderBy(col("bin"))
    val targets = binned.groupBy(col("g"), col("bin")).agg(count(lit(1)).as("bc"))
      .withColumn("cum", sum(col("bc")).over(wBin))
      .join(broadcast(rankRows), Seq("g"))
      .filter(col("cum") >= col("rank") && col("cum") - col("bc") < col("rank"))
      .select(col("g"), col("rname"), col("bin"),
        (col("rank") - (col("cum") - col("bc"))).cast("int").as("rn"))
    // rank residual rows once per DISTINCT target bin, then pick each
    // rank's row — ranking after the semi-join (not after the targets
    // join) so two ranks landing in one bin can't duplicate rows
    // under the row_number
    val targetBins = targets.select(col("g"), col("bin")).distinct()
    val wVal = Window.partitionBy(col("g"), col("bin")).orderBy(col("v"), col("t"))
    binned.join(broadcast(targetBins), Seq("g", "bin"), "left_semi")
      .withColumn("rn", row_number().over(wVal))
      .join(broadcast(targets), Seq("g", "bin", "rn"))
      .select(col("g").as(groupCol), col("rname").as("rank_name"), col("v").as("value"))
  }

  /** Exact median per group: the element at rank (n+1) div 2 under
    * (value asc, tiebreak asc). Output: (groupCol, median). */
  def groupMedian(df: DataFrame, groupCol: String, valueCol: String,
                  tieCol: String, nBins: Int = 1024): DataFrame =
    groupRankSelect(df, groupCol, valueCol, tieCol,
      Seq("median" -> (n => shiftright(n + lit(1L), 1))), nBins)
      .select(col(groupCol), col("value").as("median"))
}
