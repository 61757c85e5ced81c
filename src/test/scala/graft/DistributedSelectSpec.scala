package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.DistributedSelect

/** Histogram-narrowing exact selection: equals the window formulation
  * on random data and on the degenerate shapes that stress binning. */
class DistributedSelectSpec extends SparkSpec {
  import spark.implicits._

  private def windowMedian(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy($"g").orderBy($"v", $"t")
    df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"g")))
      .filter($"rn" === expr("(n + 1) div 2"))
      .select($"g", $"v".as("median"))
  }

  test("equals the window median on random data across bin counts") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map(i =>
      (s"g${rnd.nextInt(7)}", rnd.nextDouble() * 1000 - 500, i.toLong))
    val df = rows.toDF("g", "v", "t").repartition(8)
    val want = windowMedian(df).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (bins <- Seq(4, 64, 1024)) {
      val got = DistributedSelect.groupMedian(df, "g", "v", "t", bins)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == want, s"nBins=$bins")
    }
  }

  test("NaN values rank greatest, matching the window sort") {
    val rows =
      (1 to 9).map(i => ("mixed", if (i <= 6) i.toDouble else Double.NaN, i.toLong)) ++
        (1 to 3).map(i => ("allnan", Double.NaN, i.toLong))
    val df = rows.toDF("g", "v", "t").repartition(3)
    val want = windowMedian(df).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = DistributedSelect.groupMedian(df, "g", "v", "t", 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // mixed: rank 5 of 9 under NaN-greatest order → 5.0; allnan → NaN
    assert(got("mixed") == want("mixed") && got("mixed") == 5.0)
    assert(got("allnan").isNaN && want("allnan").isNaN)
  }

  test("degenerate shapes: all-equal group, single row, duplicate-heavy") {
    val rows =
      Seq.fill(100)(("same", 42.0)).zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) } ++
        Seq(("one", 7.0, 0L)) ++
        (1 to 99).map(i => ("dup", if (i < 60) 1.0 else i.toDouble, i.toLong))
    val df = rows.toDF("g", "v", "t").repartition(5)
    val want = windowMedian(df).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = DistributedSelect.groupMedian(df, "g", "v", "t", 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)
    assert(got("same") == 42.0 && got("one") == 7.0 && got("dup") == 1.0)
  }
}
