package graft

import org.apache.spark.sql.functions._
import graft.analytics.Similarity
import graft.sources.Tables

/** Product-quantization invariants the q134–q136 oracles can't see:
  * partition-layout independence, the 32-bit code envelope, the
  * dense distance-table layout under dropped sub-cells, and the
  * map-only encode plan. */
class PqSpec extends SparkSpec {

  private lazy val e = Tables.embeddings(spark, sf("sf0.001"))
  private lazy val books = Similarity.pqTrainCodebooks(e, 8, 16)

  test("codes fit 8 nibbles and every nibble names a live sub-cell") {
    val live: Map[Int, Set[Int]] =
      books.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val codes = Similarity.pqEncode(e, books).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val code = r.getAs[Long]("code")
      assert(code >= 0 && code < (1L << 32), s"code $code outside 32 bits")
      (0 until 8).foreach { m =>
        val j = ((code >> (4 * m)) & 15L).toInt
        assert(live(m).contains(j), s"code nibble ($m, $j) names no centroid")
      }
    }
  }

  test("encode is partition-layout independent (exact re-shard parity)") {
    val a = Similarity.pqEncode(e, books)
    val b = Similarity.pqEncode(e.repartition(7), books)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("training is reproducible run-to-run (exact-decimal means)") {
    val again = Similarity.pqTrainCodebooks(e.repartition(5), 8, 16)
    assert(books.length == again.length)
    books.zip(again).foreach { case ((m1, j1, c1), (m2, j2, c2)) =>
      assert(m1 == m2 && j1 == j2 && c1.sameElements(c2))
    }
  }

  test("re-rank sims are the exact rounded cosine (ADC never orders the output)") {
    import spark.implicits._
    val q = e.filter(col("vec_id") < 3)
    val got = Similarity.pqRerankTopK(q, e, 5, 20, books)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect()
    val vecs = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).foldLeft(0.0)((s, p) => s + p._1 * p._2)
      val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x))
      BigDecimal(d / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.nonEmpty)
    got.foreach { case (qid, nid, sim) =>
      assert(math.abs(sim - cos(vecs(qid), vecs(nid))) < 2e-6,
        s"($qid,$nid): $sim not the exact cosine")
    }
  }

  test("ADC scoring survives a dropped sub-cell (dense dtable layout)") {
    // drop centroid (m=2, j=5) from the book: codes can't reference it,
    // and the dtable's dead slot must not shift later entries
    val holed = books.filterNot(b => b._1 == 2 && b._2 == 5)
    val full = Similarity.pqTopK(e.filter(col("vec_id") < 2), e, 5, holed).collect()
    assert(full.length == 10) // 2 queries × top-5, scored without error
    val live = holed.filter(_._1 == 2).map(_._2).toSet
    Similarity.pqEncode(e, holed).collect().foreach { r =>
      val j = ((r.getAs[Long]("code") >> 8) & 15L).toInt
      assert(live.contains(j) && j != 5)
    }
  }

  test("pqEncode plans map-only: zero exchanges, wholly codegen'd") {
    val df = Similarity.pqEncode(e, books)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
    // codegen'd: the executed plan renders codegen stages as "*(n) Op"
    assert(plan.contains("*(1)"), plan.take(500))
  }
}
