package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range-containment join (left.ts ∈ [right.lo, right.hi]) WITHOUT a
  * nested loop. Spark plans a bare inequality join as
  * BroadcastNestedLoopJoin — O(|left| × |right|) comparisons — which
  * is exactly the plan that dies at scale. Binning turns it into an
  * equi-join: each left row keys by its time bin, each interval
  * explodes to the bins it covers, the bin equi-join meets every
  * containment candidate exactly once (a point lives in one bin; an
  * interval covers that bin at most once), and the residual
  * lo <= ts <= hi filter removes same-bin near-misses.
  *
  * This is the standard interval-join strategy (Flink's interval
  * join and warehouse range-join optimizations use the same shape).
  * Scale properties: shuffle keys by bin — time-uniform streams
  * spread evenly; pick `binSeconds` ≈ typical interval length so
  * intervals explode to O(1) rows (len/bin + 1). Hot bins (flash
  * events) call for finer bins plus salting, same as any skewed
  * equi-join (ops/Skew).
  */
object RangeJoin {

  /** Inner join of `left` rows to every `right` interval containing
    * their timestamp. Columns are kept from both sides (caller
    * projects). Timestamps compare at microsecond precision. */
  def binned(left: DataFrame, tsCol: String, right: DataFrame,
             loCol: String, hiCol: String, binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binUs = binSeconds * 1000000L
    val l = left.withColumn("__lbin", floor(unix_micros(col(tsCol)) / binUs))
    val r = right.withColumn("__rbin", explode(sequence(
      floor(unix_micros(col(loCol)) / binUs),
      floor(unix_micros(col(hiCol)) / binUs))))
    l.join(r, col("__lbin") === col("__rbin") &&
        col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("__lbin", "__rbin")
  }

  /** Interval × interval OVERLAP join (inclusive ends: lo1 <= hi2 AND
    * lo2 <= hi1), the generalization of `binned` to two interval
    * sets. Both sides explode to the bins they cover and equi-join on
    * the bin; because an overlapping pair can share MANY bins, the
    * join would emit duplicates — the EMIT-ONCE guard keeps a pair
    * only in the first bin both cover (the bin of max(lo1, lo2)), so
    * every overlap surfaces exactly once with no distinct shuffle.
    * Left columns must be named (loCol1, hiCol1), right (loCol2,
    * hiCol2) distinct from each other. */
  def overlapBinned(left: DataFrame, lo1: String, hi1: String,
                    right: DataFrame, lo2: String, hi2: String,
                    binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binUs = binSeconds * 1000000L
    def bins(df: DataFrame, lo: String, hi: String, out: String) =
      df.withColumn(out, explode(sequence(
        floor(unix_micros(col(lo)) / binUs),
        floor(unix_micros(col(hi)) / binUs))))
    val l = bins(left, lo1, hi1, "__b1")
    val r = bins(right, lo2, hi2, "__b2")
    l.join(r, col("__b1") === col("__b2") &&
        col(lo1) <= col(hi2) && col(lo2) <= col(hi1) &&
        col("__b1") === floor(greatest(unix_micros(col(lo1)), unix_micros(col(lo2))) / binUs))
      .drop("__b1", "__b2")
  }
}
