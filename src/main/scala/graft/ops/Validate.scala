package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation predicates + dead-letter split (SURVEY.md §2.2 O8/O9 and
  * the F5 error policy).
  *
  * Reference behavior: `is_valid_restaurant` keeps rows having all of
  * placeId/name/address/latitude/longitude
  * (submit-aws-batch-lambda/lambda_function.py:114-116); invalid rows
  * are skipped but counted. Here the split is a single pass that tags
  * rows and filters twice off the cached tag — at scale the input is
  * scanned once, not twice, if the caller caches the tagged frame.
  */
object Validate {

  /** O8: all-of-these-columns-non-null predicate. */
  def requiredFields(cols: Seq[String]): Column =
    cols.map(col(_).isNotNull).reduce(_ && _)

  def requireFields(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(requiredFields(cols))

  /** F5 policy: split into (valid, deadLetter) with a reject reason on
    * the dead-letter side instead of dropping rows silently. */
  def split(df: DataFrame, cols: Seq[String]): (DataFrame, DataFrame) = {
    val pred = requiredFields(cols)
    val tagged = df.withColumn(
      "_reject_reason",
      when(pred, lit(null).cast("string"))
        .otherwise(concat_ws(",",
          cols.map(c => when(col(c).isNull, lit(c))): _*)))
    (tagged.filter(col("_reject_reason").isNull).drop("_reject_reason"),
     tagged.filter(col("_reject_reason").isNotNull))
  }
}
