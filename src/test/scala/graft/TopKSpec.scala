package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey
import graft.sources.Tables

/** Custom TopKPerKey operator: row-identical to the window
  * formulation, planned through the custom exec, no per-key sort. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("TopKPerKey equals window row_number formulation on orders") {
    val orders = Tables.orders(spark, sf("sf0.001"))
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val got = TopKPerKey(orders, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val want = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("TopKPerKey plans the custom exec and no per-key Sort") {
    val orders = Tables.orders(spark, sf("sf0.001"))
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val plan = TopKPerKey(orders, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), plan) // exec renders minus the Exec suffix
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan) // exchange clusters, nothing sorts
  }

  test("TopKPerKey ranks NaN greatest (total order), matching the window sort") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, Double.NaN), ("a", 3L, 7.0), ("a", 4L, 6.0),
      ("b", 5L, Double.NaN), ("b", 6L, Double.NaN), ("b", 7L, 1.0)
    ).toDF("k", "id", "score")
    val got = TopKPerKey(df, Seq("k"), "score", "id", 2)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // Spark's sort ranks NaN largest: a → NaN(id2), 7.0(id3);
    // b → both NaNs, tie broken by id asc → ids 5,6
    assert(got == Set(("a", 2L), ("a", 3L), ("b", 5L), ("b", 6L)))
    val w = Window.partitionBy($"k").orderBy($"score".desc, $"id")
    val want = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("TopKPerKey honors k, ties, and null scores") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 5.0),
      ("b", 5L, 1.0), ("b", 6L, Double.NaN)
    ).toDF("k", "id", "score")
      .withColumn("score", when($"id" === 6L, lit(null)).otherwise($"score"))
    val got = TopKPerKey(df, Seq("k"), "score", "id", 2)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // a: ties at 10.0 broken by id asc → ids 1,2; b: null score dropped → id 5
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 5L)))
  }
}
