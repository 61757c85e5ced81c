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
               leftTime: String, rightTime: String): DataFrame = {
    val rightPayloadCols = right.columns.filter(c => c != rightKey && c != rightTime)
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
      .withColumn("_rpay", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.selectExpr(rightPayloadCols :+ rightTime: _*).schema.fields)))
    val r = right
      .withColumn("_k", col(rightKey)).withColumn("_t", col(rightTime))
      .withColumn("_tag", lit(0))
      .withColumn("_rpay", struct((rightPayloadCols :+ rightTime).map(col): _*))
      .select((left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
               Seq(col("_k"), col("_t"), col("_tag"), col("_rpay"))): _*)
    val combined = l.select((left.columns.map(col) ++
      Seq(col("_k"), col("_t"), col("_tag"), col("_rpay"))): _*)
      .unionByName(r)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(left.columns.map(col) :+ col("_match"): _*)
  }
}
