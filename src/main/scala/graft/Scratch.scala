package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.analytics.{DedupOps, TextAnalysis}

/** Dev-only profiling scratchpad (not part of the engine API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[$name run$i] ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }
    val docs = Tables.documents(spark, d)
    val sh = TextAnalysis.shingleSet(docs, 3)
    val q29 = DedupOps.jaccardPairs(sh, 0.6)
    val plan = q29.queryExecution.executedPlan.toString
    println("q29 ReusedExchange count: " + "ReusedExchange".r.findAllIn(plan).size)
    println("q29 Exchange count: " + "Exchange".r.findAllIn(plan).size)
    println("q29 Generate(shingle) count: " + "shingle_explode|ShingleExplode|Generate".r.findAllIn(plan).size)
    time("q29 full")(q29.count())
    // stagewise
    val q29p = DedupOps.jaccardPairsPrefix(sh, 0.6)
    time("q29 prefix-filtered")(q29p.count())
    val both = q29.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = q29p.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    println("identical results: " + (both == pref) + "  naive=" + both.size + " prefix=" + pref.size)
  }
}
