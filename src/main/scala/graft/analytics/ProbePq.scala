package graft.analytics

import org.apache.spark.sql.functions._

/** Throwaway round-17 probe: per-job timing of the q153/q154 IVF-PQ
  * training + serve chain. NOT driver surface. */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = graft.sources.Tables.embeddings(spark, d)
    (1 to 2).foreach { rep =>
      println(s"[probe] === rep $rep ===")
      val books = t("pqTrainCodebooks")(Similarity.pqTrainCodebooks(e, 8, 16))
      val cent = t("kmeansCentroids")(Similarity.kmeansCentroids(e, 16, 1))
      val out = t("serve q153")(
        Similarity.ivfPqRerankTopK(e.filter(col("vec_id") < 10), e,
          10, 100, books, cent, nProbe = 2))
      t("noop")(out.write.format("noop").mode("overwrite").save())
      t("q153 declared")(
        graft.SparkEntry.queries("q153_ann_ivfpq")(spark, d)
          .write.format("noop").mode("overwrite").save())
      t("q154 declared")(
        graft.SparkEntry.queries("q154_ann_ivfpq_store")(spark, d)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
