package graft

import org.apache.spark.sql.functions._
import graft.analytics.Selection
import graft.sources.Tables

/** DSIR importance-selection invariants the SQL oracle cannot
  * express: weight signs/values on constructed bucket counts, the
  * score = Σ bucket-weight identity, and the selection actually
  * shifting the mixture toward the target distribution.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("dsirWeights: target-heavy buckets positive, target-free negative, exact values") {
    // bucket 1: 10 pairs, all target; bucket 2: 10 pairs, none target
    val pairs = ((1 to 10).map(i => (i.toLong, "en", 1L)) ++
      (11 to 20).map(i => (i.toLong, "de", 2L))).toDF("doc_id", "lang", "bucket")
    val w = Selection.dsirWeights(pairs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    // CT=10, CR=20, B=256: w1 = (11*276)/(11*266) - 1, w2 = (1*276)/(11*266) - 1
    val w1 = BigDecimal((11.0 * 276.0) / (11.0 * 266.0) - 1.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w2 = BigDecimal((1.0 * 276.0) / (11.0 * 266.0) - 1.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(w(1L) > 0.0 && w(2L) < 0.0)
    assert(math.abs(w(1L) - w1) < 1e-9, s"got ${w(1L)} want $w1")
    assert(math.abs(w(2L) - w2) < 1e-9, s"got ${w(2L)} want $w2")
  }

  test("dsirTopK score ≡ hand-summed bucket weights") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val top = Selection.dsirTopK(docs, col("lang") === "en", 10).collect()
    assert(top.length == 10)
    // recompute one doc's score from first principles
    val pairs = Selection.featurePairs(docs)
    val w = Selection.dsirWeights(pairs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    val doc = top.head.getLong(0)
    val expected = pairs.filter(col("doc_id") === doc).collect()
      .map(r => w(r.getLong(2))).sum.toDouble
    assert(math.abs(top.head.getDouble(2) - expected) < 1e-9)
    // total order: scores non-increasing, doc_id tiebreak ascending
    val scores = top.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("selection shifts the mixture toward the target language") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val corpusEn = docs.filter(col("lang") === "en").count().toDouble /
      docs.count().toDouble
    val top = Selection.dsirTopK(docs, col("lang") === "en", 100).collect()
    val selEn = top.count(_.getString(1) == "en") / 100.0
    // measured 0.81 at sf0.01 from a ~0.41 corpus; assert a loose floor
    assert(selEn > corpusEn + 0.2,
      s"selection en-share $selEn should exceed corpus share $corpusEn by >0.2")
  }
}
