package graft.analytics

import org.apache.spark.sql.functions._

/** Throwaway round-17 probe: per-stage timing of the q166 ER path
  * (lev dictionary, matchPairs, LSS rounds). NOT driver surface. */
object ProbeLss {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val p = graft.sources.Tables.part(spark, d).select(
      col("p_partkey"), col("p_brand"), col("p_name"), col("p_type"), col("p_size"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // OLD (r14–r16) six-pass union spelling, copied verbatim for the A/B
    def matchPairsUnion(probe: org.apache.spark.sql.DataFrame,
                        base: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import EntityResolution._
      val nd = levBandPairs(probe.select(col("p_name")).distinct(),
        base.select(col("p_name")).distinct(), MAX_NAME_DIST).drop("dist")
      val a = probe.select(col("p_partkey").as("ka"), col("p_brand").as("ba"),
        col("p_name").as("n1"), col("p_type").as("ta"), col("p_size").as("sa"))
      val b = base.select(col("p_partkey").as("kb"), col("p_brand").as("bb"),
        col("p_name").as("n2b"), col("p_type").as("tb"), col("p_size").as("sb"))
      val recov = col("n2") === col("n2b") && col("ka") =!= col("kb")
      val withNames = a.join(broadcast(nd), Seq("n1"))
      val tok1Eq = block2Col(col("n1")) === block2Col(col("n2b"))
      val tok3Eq = block3Col(col("n1")) === block3Col(col("n2b"))
      val mid4Cov = block4Col(col("n1")) === block4Col(col("n2b")) &&
        block4Col(col("n1")) =!= lit("")
      val pre8Eq = block5Col(col("n1")) === block5Col(col("n2b"))
      val suf8Eq = block6Col(col("n1")) === block6Col(col("n2b"))
      val pass1 = withNames.join(b, recov && col("ba") === col("bb"))
      val pass2 = withNames.join(b, recov && tok1Eq && col("ba") =!= col("bb"))
      val pass3 = withNames.join(b, recov && tok3Eq && col("ba") =!= col("bb") && !tok1Eq)
      val pass4 = withNames.join(b, recov && mid4Cov
        && col("ba") =!= col("bb") && !tok1Eq && !tok3Eq)
      val pass5 = withNames.join(b, recov && pre8Eq && block5Col(col("n1")) =!= lit("")
        && col("ba") =!= col("bb") && !tok1Eq && !tok3Eq && !mid4Cov)
      val pass6 = withNames.join(b, recov && suf8Eq && block6Col(col("n1")) =!= lit("")
        && col("ba") =!= col("bb") && !tok1Eq && !tok3Eq && !mid4Cov
        && !(pre8Eq && block5Col(col("n1")) =!= lit("")))
      val score = lit(W_NAME) +
        when(col("ta") === col("tb"), W_TYPE).otherwise(0) +
        when(abs(col("sa") - col("sb")) <= SIZE_BAND, W_SIZE).otherwise(0)
      pass1.unionByName(pass2).unionByName(pass3).unionByName(pass4)
        .unionByName(pass5).unionByName(pass6)
        .filter(score >= MATCH_THRESHOLD)
        .select(least(col("ka"), col("kb")).as("d1"),
          greatest(col("ka"), col("kb")).as("d2"))
        .distinct()
    }
    (1 to 2).foreach { rep =>
      println(s"[probe] === rep $rep ===")
      val po = t("matchPairs-UNION")(
        matchPairsUnion(p, p).localCheckpoint(true))
      println(s"[probe] union pairs = ${po.count()}")
      val pairs = t("matchPairs-FLAG")(
        EntityResolution.matchPairs(p, p).localCheckpoint(true))
      println(s"[probe] flag pairs = ${pairs.count()}")
      // replicate the LSS loop with per-round timing
      var edges = t("round0-canon")(
        pairs.select(col("d1").as("u"), col("d2").as("v"))
          .filter(col("u") =!= col("v"))
          .select(greatest(col("u"), col("v")).as("u"),
            least(col("u"), col("v")).as("v"))
          .distinct().localCheckpoint(true))
      var prevN = edges.count()
      var changed = 1L
      var i = 0
      while (changed > 0 && i < 30) {
        val after = t(s"round$i-ckpt")(DedupOps.lssRound(edges).localCheckpoint(true))
        val n = t(s"round$i-count")(after.count())
        changed = if (n != prevN) 1L else t(s"round$i-except")(after.exceptAll(edges).count())
        prevN = n
        edges = after
        i += 1
      }
      t("resolve-tail") {
        val comp = edges.select(col("u").as("doc_id"), col("v").as("component"))
        noop(comp)
      }
    }
    spark.stop()
  }
}
