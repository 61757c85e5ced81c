package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) left join: for each left row, the latest
  * right row with rightTime <= leftTime within the same key — the
  * standard enrichment for event streams against slowly-changing
  * state (here: events against each user's most recent order).
  *
  * Spark-first construction (preference order (a): composed
  * built-ins, no custom SparkPlan needed): union both sides tagged,
  * then one window pass per key ordered by (time, tag) takes
  * last(right payload, ignoreNulls) — right rows sort before left
  * rows at equal timestamps, so the match is inclusive. Cost: ONE
  * shuffle on the key + a sort within partitions — the same shape as
  * a sort-merge join, with no range-explosion; this is the 100 TB
  * plan (a naive inequality join would be a broadcast nested loop).
  *
  * Caller contract: `right` must be unique per (key, time) —
  * pre-aggregate if needed — otherwise which same-timestamp row wins
  * is plan-dependent.
  */
object AsOfJoin {

  def leftAsOf(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime, forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * rightTime >= leftTime in the same key — the "next event after"
    * lookup a labeling pipeline runs (e.g. next purchase after each
    * view, churn horizon labels). Same single-shuffle union+window
    * shape as leftAsOf, mirrored: frame [current row, ∞) takes
    * first(right payload); right rows sort AFTER left rows at equal
    * timestamps, so the match is inclusive. */
  def leftAsOfForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime, forward = true)

  private def asOf(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   forward: Boolean): DataFrame = {
    // tag order decides equal-timestamp inclusivity: backward wants
    // right rows BEFORE left rows at equal _t (rightTime <= leftTime
    // inclusive), forward wants them AFTER (rightTime >= leftTime)
    val (leftTag, rightTag) = if (forward) (0, 1) else (1, 0)
    val rightPayloadCols = right.columns.filter(c => c != rightKey && c != rightTime)
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(leftTag))
      .withColumn("_rpay", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.selectExpr((rightPayloadCols :+ rightTime).toIndexedSeq: _*).schema.fields)))
    val r = right
      .withColumn("_k", col(rightKey)).withColumn("_t", col(rightTime))
      .withColumn("_tag", lit(rightTag))
      .withColumn("_rpay", struct((rightPayloadCols :+ rightTime).map(col).toIndexedSeq: _*))
      .select((left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
               Seq(col("_k"), col("_t"), col("_tag"), col("_rpay"))).toIndexedSeq: _*)
    val combined = l.select((left.columns.map(col) ++
      Seq(col("_k"), col("_t"), col("_tag"), col("_rpay"))).toIndexedSeq: _*)
      .unionByName(r)
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_tag"))
    val (frame, pick) =
      if (forward)
        (w.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("_rpay"), ignoreNulls = true))
      else
        (w.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("_rpay"), ignoreNulls = true))
    combined
      .withColumn("_match", pick.over(frame))
      .filter(col("_tag") === lit(leftTag))
      .select((left.columns.map(col) :+ col("_match")).toIndexedSeq: _*)
  }
}
