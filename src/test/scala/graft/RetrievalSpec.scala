package graft

import org.apache.spark.sql.functions._
import graft.analytics.{DedupOps, Retrieval}

/** Closed-form checks for the BM25 retrieval operator and the
  * canonical-keeper election (q146/q147's library surface). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with hand-checkable tf/df/dl
  private def corpus = Seq(
    (0L, "a b a c"),       // dl 4, tf(a)=2
    (1L, "a b"),           // dl 2
    (2L, "c c c c c c"),   // dl 6, tf(c)=6
    (3L, "d d")            // dl 2, no query term
  ).toDF("doc_id", "text")

  /** Independent reimplementation of the scoring formula (plain
    * scalar doubles, same op order) for the expected values. */
  private def bm25(tf: Int, df: Int, dl: Double, n: Long, avgdl: Double,
                   k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)
    val raw = idf * (tf.toDouble * (k1 + 1.0)) /
      (tf.toDouble + k1 * ((1.0 - b) + b * (dl / avgdl)))
    BigDecimal(math.round(raw * 1e6).toDouble / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("postings: only query-vocabulary terms survive, tf/dl correct") {
    val p = Retrieval.postings(corpus, Seq("a", "c"))
      .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
    assert(p.toSeq === Seq(
      ("a", 0L, 4.0, 2L), ("a", 1L, 2.0, 1L),
      ("c", 0L, 4.0, 1L), ("c", 2L, 6.0, 6L)))
  }

  test("bm25TopK matches the closed-form scores, ranks on exact decimal") {
    // N=4, sum dl = 14, avgdl = 3.5
    val n = 4L; val avgdl = 14.0 / 4.0
    val q = Seq((1L, "a"), (1L, "c")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(corpus, q, 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    // df(a)=2, df(c)=2
    val s0 = bm25(2, 2, 4.0, n, avgdl) + bm25(1, 2, 4.0, n, avgdl) // doc 0: a + c
    val s1 = bm25(1, 2, 2.0, n, avgdl)                             // doc 1: a
    val s2 = bm25(6, 2, 6.0, n, avgdl)                             // doc 2: c
    val expectedOrder = Seq(0L -> s0, 1L -> s1, 2L -> s2)
      .sortBy { case (id, s) => (-s, id) }
    assert(got.map(_._3).toSeq === expectedOrder.map(_._1))
    got.zip(expectedOrder).foreach { case ((_, _, _, score), (_, exp)) =>
      assert(math.abs(score - exp) < 1e-9, s"score $score vs $exp")
    }
    assert(got.map(_._2).toSeq === Seq(1L, 2L, 3L)) // dense ranks
  }

  test("bm25: doc matching no query term is absent; per-query isolation") {
    val q = Seq((1L, "a"), (2L, "c")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(corpus, q, 10)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 0L), (1L, 1L), (2L, 0L), (2L, 2L)))
    assert(!got.exists(_._2 == 3L))
  }

  test("incremental index: union of split indexes + merged stats ≡ direct corpus scoring") {
    val q = Seq((1L, "a"), (1L, "c"), (2L, "b")).toDF("query_id", "term")
    val left = corpus.filter(col("doc_id") < 2)
    val right = corpus.filter(col("doc_id") >= 2)
    val (n1, t1) = Retrieval.corpusTokenStats(left)
    val (n2, t2) = Retrieval.corpusTokenStats(right)
    val merged = Retrieval.buildIndex(left).unionByName(Retrieval.buildIndex(right))
    val viaIndex = Retrieval.bm25TopKFromIndex(merged, n1 + n2,
        (t1 + t2).toDouble / (n1 + n2).toDouble, q, 10)
      .as[(Long, Long, Long, Double)].collect().toSet
    val direct = Retrieval.bm25TopK(corpus, q, 10)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty)
  }

  test("canonicalKeepers: max quality wins, doc_id breaks ties") {
    val labels = Seq(
      (10L, 10L), (11L, 10L), (12L, 10L), // cluster 10
      (20L, 20L), (21L, 20L)              // cluster 20 (tied quality)
    ).toDF("doc_id", "component")
    val quality = Seq(
      (10L, 0.1), (11L, 0.9), (12L, 0.5),
      (20L, 0.7), (21L, 0.7)
    ).toDF("doc_id", "quality")
    val r = DedupOps.canonicalKeepers(labels, quality)
      .as[(Long, Long, Double, Long, Boolean)].collect().sortBy(_._1)
    // cluster 10: doc 11 (highest quality, not min id) is keeper
    assert(r.filter(_._2 == 10L).map(x => (x._1, x._4, x._5)).toSeq ===
      Seq((10L, 11L, false), (11L, 11L, true), (12L, 11L, false)))
    // cluster 20: tie on quality → min doc_id
    assert(r.filter(_._2 == 20L).map(x => (x._1, x._4, x._5)).toSeq ===
      Seq((20L, 20L, true), (21L, 20L, false)))
  }

  test("canonicalKeepers plans no window over the membership frame") {
    val labels = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "component")
    val quality = Seq((1L, 0.5), (2L, 0.6)).toDF("doc_id", "quality")
    val plan = DedupOps.canonicalKeepers(labels, quality)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }
}
