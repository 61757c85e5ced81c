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

  test("band store bucketed by (k, bv): the delta probe shuffles only the delta") {
    import graft.analytics.DedupOps
    // the incremental-dedup scale claim (bandRows scaladoc): a nightly
    // pipeline persists the band store bucketed by (k, bv), so the
    // delta's probe join co-locates against it with NO store-side
    // exchange — re-dedup shuffles O(delta), never O(store)
    val d = sf("sf0.001")
    val docs = Tables.documents(spark, d)
    val ingested = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    DedupOps.minhashBandStore(ingested).write.mode("overwrite")
      .bucketBy(8, "k", "bv").sortBy("k", "bv").saveAsTable("band_store_b")
    val store = spark.table("band_store_b")
    val deltaBands = DedupOps.minhashBandStore(delta)
    val probe = deltaBands.select(col("k"), col("bv"), col("doc_id").as("da"))
      .hint("merge")
      .join(store.select(col("k"), col("bv"), col("doc_id").as("db")), Seq("k", "bv"))
      .filter(col("da") =!= col("db"))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    // exactly ONE hashpartitioning exchange on (k, bv) — the delta
    // side; the bucketed store reads pre-partitioned
    val nExch = "Exchange hashpartitioning\\(k".r.findAllIn(plan).size
    assert(nExch == 1, plan)
    assert(plan.contains("Bucketed: true") || plan.contains("SelectedBucketsCount"), plan)
    // and the bucketed probe finds exactly the unbucketed candidates
    val want = deltaBands.select(col("k"), col("bv"), col("doc_id").as("da"))
      .join(DedupOps.minhashBandStore(ingested)
        .select(col("k"), col("bv"), col("doc_id").as("db")), Seq("k", "bv"))
      .filter(col("da") =!= col("db"))
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = probe.select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
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
