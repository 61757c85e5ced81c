package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame for custom operators (Dataset.ofRows is
  * private[sql]; same convention as ColumnBridge). */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** RDD[InternalRow] → DataFrame without a row-conversion pass
    * (internalCreateDataFrame is private[sql]). The rows must already
    * match `schema`'s physical layout. */
  def ofInternalRows(spark: SparkSession,
                     rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                     schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Same, flagged isStreaming — the form a legacy streaming Source's
    * getBatch must return (MicroBatchExecution asserts the returned
    * plan is a streaming one). */
  def ofInternalRowsStreaming(spark: SparkSession,
                              rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
