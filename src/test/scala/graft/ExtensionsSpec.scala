package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.sources.Tables

/** GraftExtensions: SQL function registration + the HOF→VecDot
  * optimizer rewrite. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val installed: Unit = GraftExtensions.install(spark)

  test("vec_dot callable from SQL") {
    installed
    Tables.embeddings(spark, sf("sf0.001")).limit(5).createOrReplaceTempView("emb_ext")
    val rows = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS n2 FROM emb_ext").collect()
    assert(rows.length == 5 && rows.forall(_.getDouble(1) > 0))
  }

  test("optimizer rewrites aggregate(zip_with(...)) to native VecDot") {
    installed
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val hof = e.select(
      aggregate(
        zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("n2"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vecdot"), optimized)
    // and the rewritten plan computes the same values as interpreted HOF
    val nat = e.select(graft.functions.VecExpressions.vec_dot($"embedding", $"embedding").as("n2"))
    assert(hof.except(nat).count() == 0 && nat.except(hof).count() == 0)
  }

  test("double install is a no-op (no duplicate registration)") {
    installed
    val rulesBefore = spark.experimental.extraOptimizations
    val stratsBefore = spark.experimental.extraStrategies
    GraftExtensions.install(spark)
    assert(spark.experimental.extraOptimizations == rulesBefore)
    assert(spark.experimental.extraStrategies == stratsBefore)
    // function still resolves, registered exactly once
    assert(spark.sessionState.functionRegistry.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")))
  }

  test("shingle_explode and span_explode callable from SQL") {
    installed
    Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
      .createOrReplaceTempView("docs_ext")
    val sh = spark.sql(
      "SELECT doc_id, shingle_explode(text, 3) AS s FROM docs_ext").collect()
    assert(sh.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a b c"), (1L, "b c d")))
    val sp = spark.sql(
      "SELECT doc_id, span_explode(text, 2) FROM docs_ext").collect()
    assert(sp.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet ==
      Set((1L, 1, "a b"), (1L, 2, "b c"), (1L, 3, "c d"), (2L, 1, "x y")))
    // the width fixes the output schema, so it must be a literal
    val e = intercept[Exception] {
      spark.sql("SELECT span_explode(text, doc_id) FROM docs_ext").collect()
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null).take(5)
      .exists(t => Option(t.getMessage).exists(_.contains("INT literal"))), e.toString)
  }

  test("rewrite does not fire on non-dot folds") {
    installed
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val sumFold = e.select(
      aggregate(zip_with($"embedding", $"embedding", (x, y) => x.cast("double") + y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!sumFold.queryExecution.optimizedPlan.toString.contains("vecdot"))
  }
}
