package graft

import org.apache.spark.sql.functions._
import graft.functions.VecExpressions.vec_dot
import graft.sources.Tables

/** Native VecDot expression: bitwise parity with the HOF formulation
  * and codegen participation. */
class VecSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("VecDot == HOF dot bit-for-bit on all corpus float vectors") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val q = e.limit(20).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val both = e.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(
        vec_dot(col("qv"), col("embedding")).as("native"),
        hofDot(col("qv"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("VecDot handles double arrays and mixed float/double") {
    val df = Seq((Seq(1.5, 2.5, -1.0), Seq(2.0f, 3.0f, 4.0f))).toDF("d", "f")
    val got = df.select(
      vec_dot(col("d"), col("d")).as("dd"),
      vec_dot(col("f"), col("f")).as("ff"),
      vec_dot(col("d"), col("f")).as("df")).collect().head
    assert(got.getDouble(0) == 1.5 * 1.5 + 2.5 * 2.5 + 1.0)
    assert(got.getDouble(1) == 4.0 + 9.0 + 16.0)
    assert(got.getDouble(2) == 3.0 + 7.5 - 4.0)
  }

  test("VecDot: length mismatch yields null; nulls propagate") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).collect().head.isNullAt(0))
    val dfNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(dfNull.select(vec_dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("VecDot runs inside whole-stage codegen") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val plan = e.select(vec_dot(col("embedding"), col("embedding")).as("n2"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vecdot"), plan)
  }
}
