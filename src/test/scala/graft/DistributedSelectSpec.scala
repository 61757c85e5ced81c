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

  test("null and ±Inf values bin consistently with the window sort") {
    // Global asc order: null < -Inf < finite < +Inf < NaN. Groups are
    // built so the median lands on each non-finite class at least once.
    val rows =
      // 5 nulls + 4 finite → median (rank 5) is a null
      (1 to 5).map(i => ("nullmed", null.asInstanceOf[java.lang.Double], i.toLong)) ++
        (6 to 9).map(i => ("nullmed", java.lang.Double.valueOf(i.toDouble), i.toLong)) ++
        // 2 nulls + 3 finite + 2 +Inf → median (rank 4) is finite 2.0
        (1 to 2).map(i => ("mixed", null.asInstanceOf[java.lang.Double], i.toLong)) ++
        (1 to 3).map(i => ("mixed", java.lang.Double.valueOf(i.toDouble), (i + 2).toLong)) ++
        (1 to 2).map(i => ("mixed", java.lang.Double.valueOf(Double.PositiveInfinity), (i + 5).toLong)) ++
        // 3 -Inf + 2 finite → median (rank 3) is -Inf
        (1 to 3).map(i => ("neginf", java.lang.Double.valueOf(Double.NegativeInfinity), i.toLong)) ++
        (1 to 2).map(i => ("neginf", java.lang.Double.valueOf(i.toDouble), (i + 3).toLong)) ++
        // 1 finite + 3 +Inf + 1 NaN → median (rank 3) is +Inf
        Seq(("posinf", java.lang.Double.valueOf(1.0), 1L)) ++
        (1 to 3).map(i => ("posinf", java.lang.Double.valueOf(Double.PositiveInfinity), (i + 1).toLong)) ++
        Seq(("posinf", java.lang.Double.valueOf(Double.NaN), 5L)) ++
        // all-null group
        (1 to 3).map(i => ("allnull", null.asInstanceOf[java.lang.Double], i.toLong))
    val df = rows.toDF("g", "v", "t").repartition(4)
    val want = windowMedian(df).collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    val got = DistributedSelect.groupMedian(df, "g", "v", "t", 8)
      .collect().map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got == want)
    assert(got("nullmed").isEmpty)
    assert(got("mixed").contains(2.0))
    assert(got("neginf").contains(Double.NegativeInfinity))
    assert(got("posinf").contains(Double.PositiveInfinity))
    assert(got("allnull").isEmpty)
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
