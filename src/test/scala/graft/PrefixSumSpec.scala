package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.PrefixSum

/** Two-pass distributed cumsum: row-identical to the global-order
  * window formulation under any partition count, with no WindowExec
  * in the plan. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("equals the single-partition window cumsum for any partition count") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(100).toLong))
    val df = rows.toDF("k", "v").repartition(7) // scrambled input layout
    val w = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = rows.toDF("k", "v").withColumn("cum", sum($"v").over(w))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (n <- Seq(1, 3, 8)) {
      val got = PrefixSum.withRunningSum(df, "k", "v", "cum", n)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got == want, s"numPartitions=$n")
    }
  }

  test("null values count as zero") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(2L))).toDF("k", "v")
    val got = PrefixSum.withRunningSum(df, "k", "v", "cum", 2)
      .orderBy("k").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(5L, 5L, 7L))
  }
}
