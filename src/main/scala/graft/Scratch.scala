package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling scratchpad (not part of the engine API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val out = spark.sql(
        """WITH RECURSIVE r(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM r WHERE n < 5)
          |SELECT sum(n) FROM r""".stripMargin).collect()
      println("recursive CTE OK: " + out.mkString(","))
    } catch { case e: Throwable => println("recursive CTE FAILED: " + e.getMessage.take(300)) }
    try {
      val out2 = spark.sql(
        """SELECT v, sum(v) OVER (ORDER BY t RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW) AS s
          |FROM VALUES (timestamp'2024-01-01 00:00:00', 1.0), (timestamp'2024-01-01 00:05:00', 2.0),
          |            (timestamp'2024-01-01 00:20:00', 4.0) AS t(t, v)""".stripMargin).collect()
      println("RANGE interval frame OK: " + out2.mkString(","))
    } catch { case e: Throwable => println("RANGE frame FAILED: " + e.getMessage.take(300)) }
  }
}
