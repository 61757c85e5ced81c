package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Exact

/** DSIR-style importance selection over hashed n-gram features (Xie
  * et al. 2023, "Data Selection for Language Models via Importance
  * Resampling", NeurIPS) — score each document by how much its
  * features look drawn from a TARGET distribution rather than the
  * raw corpus, then keep the top scorers. Re-expressed Spark-first
  * and oracle-portable:
  *
  *   - features are the per-document DISTINCT word bigrams
  *     ([[graft.functions.ShingleExplode]]'s zero-shuffle map-side
  *     explode), hashed into [[NUM_BUCKETS]] buckets by the first
  *     two hex chars of sha-256 — the paper's hashed n-gram feature
  *     space with the engine's portable hash;
  *   - a bucket's importance weight is the CENTERED add-one-smoothed
  *     target/raw likelihood ratio
  *       w[b] = ((ct[b]+1) · (CR+B)) / ((cr[b]+1) · (CT+B)) − 1
  *     — the first-order rational surrogate of the paper's log-ratio
  *     (ln r ≈ r−1 near 1; ratios here live in [0.5, 2]): every
  *     operand is an exact-in-double integer and double multiply /
  *     divide are single correctly-rounded IEEE ops, identical on
  *     every engine (COVERAGE §C: no transcendentals). Centering
  *     matters: the raw ratio sum is ~n_features + signal, so length
  *     swamps target-likeness (measured at sf0.1: top-100 was 41%
  *     target-language); the centered sum scores a neutral doc ~0
  *     regardless of length and agrees with the true-log selection
  *     on 95 of the top-100 (71% vs 70% target-language — measured
  *     in DuckDB on the real corpus before this spelling was
  *     chosen). duckRound(·,6) pins the stored weight to the
  *     oracle's rounding;
  *   - a document's score is the sum of its features' bucket weights
  *     as an exact DECIMAL(21,10) (the q80/q81 pattern). Summing at
  *     the PAIR level — one weight row per (doc, feature) — avoids
  *     any decimal multiplication (engines disagree on decimal
  *     product scale rules), and the per-doc partial agg keeps the
  *     only shuffle doc-sized.
  *
  * Scale shape: the weight table is bucket-count-sized (256 here; a
  * production config uses 2^20 and it is still broadcastable) —
  * collected once (model-sized, the MLlib-fit pattern: the collect
  * removes the scalar-totals join that would otherwise constant-fold
  * into the BNLJ PlanSpec bans) and broadcast back for scoring. The
  * corpus is touched twice (fit pass, score pass — DSIR's own
  * shape); each pass is a map-side explode feeding one partial-agged
  * shuffle. Nothing is ever all-pairs, nothing corpus-sized crosses
  * the driver. Documents with no bigram (≤1 token) carry no feature
  * evidence and are not scored — they cannot be selected, matching
  * the paper's zero-feature convention.
  */
object Selection {

  /** Feature-hash width. 256 keeps the oracle's hex arithmetic to two
    * chars; the operator itself is width-agnostic. */
  val NUM_BUCKETS = 256

  /** Portable feature-hash bucket: integer value of the first two hex
    * chars of sha-256 (the q86/q130 bucket idiom). */
  def featureBucket(s: Column): Column =
    conv(substring(sha2(s, 256), 1, 2), 16, 10).cast("long")

  /** (doc_id, lang, bucket) — one row per distinct word bigram per
    * document, map-side only. */
  def featurePairs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        graft.functions.ShingleExplode.shingle_explode(col("text"), 2).as("s"))
      .select(col("doc_id"), col("lang"), featureBucket(col("s")).as("bucket"))

  /** The importance-weight table: one row per non-empty bucket with
    * its smoothed target/raw ratio, duckRound(·,6) → DECIMAL(21,10).
    * Bucket counts are collected (≤ [[NUM_BUCKETS]] rows) so the
    * corpus totals enter the weight expression as exact literals. */
  def dsirWeights(pairs: DataFrame, isTarget: Column): DataFrame = {
    val bc = pairs
      .groupBy("bucket")
      .agg(count(lit(1)).as("cr"), count(when(isTarget, 1)).as("ct"))
    val counts = bc.collect() // model-sized: ≤ NUM_BUCKETS rows
    val crTot = counts.map(_.getLong(1)).sum
    val ctTot = counts.map(_.getLong(2)).sum
    val spark = pairs.sparkSession
    import spark.implicits._
    val local = counts.toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toDF("bucket", "cr", "ct")
    // exact-in-double integers; multiply/divide/subtract order mirrors the SQL
    local.select(col("bucket"),
      Exact.duckRound(
          ((col("ct").cast("double") + lit(1.0d)) * lit((crTot + NUM_BUCKETS).toDouble)) /
          ((col("cr").cast("double") + lit(1.0d)) * lit((ctTot + NUM_BUCKETS).toDouble)) -
          lit(1.0d),
          6)
        .cast("decimal(21,10)").as("wgt"))
  }

  /** Top-k documents by DSIR importance score (score desc, doc_id asc
    * — a total order). One broadcast join of the weight table into
    * the pair stream, one doc-sized partial-agged shuffle, one
    * TakeOrderedAndProject. */
  def dsirTopK(docs: DataFrame, isTarget: Column, k: Int): DataFrame = {
    val pairs = featurePairs(docs)
    val weights = dsirWeights(pairs, isTarget)
    pairs.join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("wgt")).as("sd"))
      .select(col("doc_id"), col("lang"),
        col("sd").cast("double").as("dsir_score"))
      .orderBy(desc("dsir_score"), col("doc_id"))
      .limit(k)
  }
}
