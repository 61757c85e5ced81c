package graft.sources.v2

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In}

/** SupportsRuntimeV2Filtering: the DSv2 face of dynamic partition
  * pruning. Lives in the v2 package to reach the private[v2]
  * translator directly. */
class RuntimeFilterSpec extends graft.SparkSpec {

  test("RuntimePredicate translates IN/= with single-column refs; declines everything else") {
    val in = new Predicate("IN", Array(
      Expressions.column("lang"),
      Expressions.literal("en"), Expressions.literal("de")))
    assert(RuntimePredicate.toSourceFilter(in)
      .contains(In("lang", Array[Any]("en", "de"))))
    val eq = new Predicate("=", Array(
      Expressions.column("doc_id"), Expressions.literal(7L)))
    assert(RuntimePredicate.toSourceFilter(eq).contains(EqualTo("doc_id", 7L)))
    // non-literal member → decline (Spark re-applies above the scan)
    val weird = new Predicate("IN", Array(
      Expressions.column("lang"), Expressions.column("other")))
    assert(RuntimePredicate.toSourceFilter(weird).isEmpty)
    val unknown = new Predicate("STARTS_WITH", Array(
      Expressions.column("lang"), Expressions.literal("e")))
    assert(RuntimePredicate.toSourceFilter(unknown).isEmpty)
  }

  test("In filter evaluates with SQL null semantics in the reader filter algebra") {
    assert(FilterEval.supported(In("lang", Array[Any]("en"))))
    assert(FilterEval.eval(In("lang", Array[Any]("en", "de")), Map("lang" -> "de")))
    assert(!FilterEval.eval(In("lang", Array[Any]("en", "de")), Map("lang" -> "fr")))
    assert(!FilterEval.eval(In("lang", Array[Any]("en")), Map("lang" -> null)),
      "null never matches IN")
    // null list members: SQL `x IN (null)` is never TRUE — the string
    // "null" must not match a null literal, and a pure-null list drops
    assert(!FilterEval.eval(In("lang", Array[Any]("en", null)), Map("lang" -> "null")),
      "string 'null' must not match a null list literal")
    assert(FilterEval.eval(In("lang", Array[Any]("en", null)), Map("lang" -> "en")))
    assert(!FilterEval.eval(In("lang", Array[Any](null)), Map("lang" -> "en")))
    // cross-type comparisons decline (None), never silently match
    assert(!FilterEval.eval(In("doc_id", Array[Any]("7")), Map("doc_id" -> 7L)),
      "type-mismatched IN value must decline, not match")
    assert(!FilterEval.eval(EqualTo("lang", 7L), Map("lang" -> "7")))
    assert(!FilterEval.eval(GreaterThan("lang", 7L), Map("lang" -> "zz")),
      "mismatched GreaterThan must decline, not keep-all")
  }

  test("runtime filters embedded at planInputPartitions prune rows inside the reader") {
    // createReaderFactory() is forced at planning time (before the DPP
    // subquery), so the ONLY correct carrier is the partition — this
    // test exercises exactly Spark's call order: factory first,
    // filter(), then re-planned partitions.
    val f = java.nio.file.Files.createTempFile("graft-rtf-unit", ".jsonl")
    java.nio.file.Files.write(f,
      (0 until 10).map(i => s"""{"doc_id":$i,"lang":"${if (i % 3 == 0) "en" else "fr"}"}""")
        .mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType)))
    val scan = new JsonLinesScan(schema, schema, Array.empty, f.toString)
    val factory = scan.createReaderFactory() // Spark forces this FIRST
    def emitted(): Long = scan.planInputPartitions().map { p =>
      val r = factory.createReader(p)
      var n = 0L
      try { while (r.next()) n += 1 } finally r.close()
      n
    }.sum
    assert(emitted() == 10L)
    scan.filter(Array(new Predicate("IN", Array(
      Expressions.column("lang"), Expressions.literal("en")))))
    assert(emitted() == 4L, "reader must emit only runtime-filter survivors")
  }

  test("broadcast join plans a runtime filter on the jsonl scan; result matches the parquet twin") {
    val d = sf("sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-rtf-spec").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType)))
    val base = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"))
    base.write.format("graft.sources.v2.JsonLinesSource")
      .mode("append").save(s"$dir/src")
    base.write.mode("overwrite").parquet(s"$dir/twin")
    // a selective parquet-backed dim (a LocalRelation dim constant-
    // folds its filter away and DPP sees nothing selective)
    def dim = spark.read.parquet(s"$dir/twin")
      .select(col("lang"), col("doc_id").as("k")).filter(col("k") < 5)
    val viaJsonl = spark.read.format("graft.sources.v2.JsonLinesSource")
      .schema(schema).load(s"$dir/src").join(dim, Seq("lang"))
    val got = viaJsonl.collect().map(_.toString).sorted.toSeq
    val plan = viaJsonl.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruningexpression("),
      s"DPP must reach the jsonl scan: $plan")
    val want = spark.read.parquet(s"$dir/twin").join(dim, Seq("lang"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && got.nonEmpty)

    // the pruning must FIRE, not just plan: the reader-level metric
    // counts rows actually emitted — must equal the base rows whose
    // lang survives the dim, strictly fewer than the corpus
    val total = base.count()
    val dimLangs = dim.select("lang").distinct().collect().map(_.getString(0)).toSeq
    val expected = base.filter(col("lang").isin(dimLangs: _*)).count()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(scans)
    }
    val jsonlScan = scans(viaJsonl.queryExecution.executedPlan)
      .find(_.toString.contains("graft-jsonl"))
      .getOrElse(fail("jsonl BatchScanExec not found in executed plan"))
    val rowsEmitted = jsonlScan.metrics(RowsEmittedMetric.NAME).value
    assert(expected < total, "fixture must be selective for the test to mean anything")
    assert(rowsEmitted == expected,
      s"reader must emit only join-key survivors: emitted=$rowsEmitted expected=$expected total=$total")
  }
}
