package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketing: pre-partitioned co-located joins — the "pay the shuffle
  * once at write time" strategy for repeatedly-joined 100 TB fact
  * tables. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs with zero shuffle exchanges") {
    val d = sf("sf0.001")
    Tables.orders(spark, d).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    Tables.lineitem(spark, d)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b"), "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // both scans are bucketed on the join key: SMJ with no
    // hashpartitioning exchange on either input
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"), plan)
    // and the result matches the unbucketed computation
    val want = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(joined.except(want).count() == 0 && want.except(joined).count() == 0)
  }

  test("hive-partitioned layout prunes non-matching partitions at the scan") {
    val d = sf("sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    // the standard 100 TB layout: directory-partition the fact table
    // by its hottest filter column at write time
    Tables.events(spark, d).write.mode("overwrite")
      .partitionBy("event_type").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning —
    // non-matching partitions are never opened), NOT in the row-level
    // PushedFilters / post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type"), plan)
    // pruned read matches the unpartitioned filter
    val want = Tables.events(spark, d).filter(col("event_type") === "click").count()
    assert(one.count() == want)
    // and the partition column survives the round-trip as data
    assert(one.select("event_type").distinct().collect().map(_.getString(0)).toSeq == Seq("click"))
  }
}
