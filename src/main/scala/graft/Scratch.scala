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
    time("docs.count")(docs.count())
    time("explode words")(docs.select(explode(split(col("text"), " "))).count())
    time("shingles explode")(
      docs.select(explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3))).count())
    time("shingleSet (distinct)")(TextAnalysis.shingleSet(docs, 3).count())
    time("shingleSet+sha")(
      TextAnalysis.shingleSet(docs, 3).select(DedupOps.baseHash(col("s"))).count())
    time("minhash sigs")(DedupOps.minhashSignatures(TextAnalysis.shingleSet(docs, 3)).count())

    // native VecDot vs HOF dot on the full pairwise similarity space
    val e = Tables.embeddings(spark, d)
    val q = e.limit(200).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    time("pairwise dot HOF")(
      e.join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(sum(hofDot(col("qv"), col("embedding")))).count())
    time("pairwise dot native")(
      e.join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(sum(graft.functions.VecExpressions.vec_dot(col("qv"), col("embedding")))).count())
    spark.stop()
  }
}
