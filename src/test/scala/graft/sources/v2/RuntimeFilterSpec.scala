package graft.sources.v2

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.sources.{EqualTo, In}

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
  }
}
