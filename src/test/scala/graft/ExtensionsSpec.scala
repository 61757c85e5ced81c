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

  test("rewrite does not fire on non-dot folds") {
    installed
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val sumFold = e.select(
      aggregate(zip_with($"embedding", $"embedding", (x, y) => x.cast("double") + y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!sumFold.queryExecution.optimizedPlan.toString.contains("vecdot"))
  }
}
