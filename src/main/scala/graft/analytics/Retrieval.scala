package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Keyword retrieval over the corpus — the inverted-index face of
  * curation (targeted inspection, seeded filtering, contamination
  * triage on a 100 TB corpus where "grep" is a full scan).
  *
  * Scale shape: the exploded token stream is filtered to the query
  * vocabulary BEFORE the tf groupBy, so the only shuffle is
  * O(matching postings), never O(corpus tokens); document length
  * rides along in the posting row (no corpus-sized dl join); df and
  * the query grid broadcast. A persisted inverted index (the
  * DedupOps band-store pattern) serves the same `postings` frame
  * without the corpus scan — downstream plan identical.
  *
  * Scoring is BM25 with the RATIONAL idf (N-df+0.5)/(df+0.5): the log
  * damping is omitted because ln is not engine-portable (the
  * no-transcendentals rule, COVERAGE.md §C). Per-term ranking is
  * order-equivalent to log-idf BM25; cross-term weighting differs
  * only in idf spread. Every arithmetic step is a fixed IEEE
  * expression tree; per-term contributions are duckRound(6)ed then
  * decimal-summed (the q80/q81 pattern) so scores are exact and
  * partition-order independent, and ranks compare the DECIMAL.
  */
object Retrieval {

  /** Query-term posting lists: (term, doc_id, dl, tf) for the given
    * vocabulary only. dl (document token length, double) is carried
    * in the posting row so scoring needs no corpus-sized join. */
  def postings(docs: DataFrame, terms: Seq[String]): DataFrame =
    docs.select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("dl"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** The FULL inverted index: postings for every term — the nightly
    * persisted artifact (bucket/partition by term on a real store so
    * a query's posting lists are a pruned read). Postings of disjoint
    * doc sets union losslessly: tf/dl are per-doc, df and corpus
    * stats recompute from the merged frame — so index maintenance is
    * O(Δ): build the delta's index, append (q149). */
  def buildIndex(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("dl"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Mergeable corpus stats for BM25's globals: (doc count, token
    * count). Disjoint corpora merge by component-wise sum;
    * avgdl = tokens/docs at query time. */
  def corpusTokenStats(docs: DataFrame): (Long, Long) = {
    val st = docs.agg(
      count(lit(1)).as("n"),
      sum(size(split(col("text"), " ")).cast("long")).as("s")).first()
    (st.getLong(0), st.getLong(1))
  }

  /** The query vocabulary, collected once on the driver (the grid is
    * query-sized by definition). Empty terms are dropped — the
    * tokenizer can produce them (double spaces) and [[buildIndex]]
    * never stores them, so admitting "" on the direct path would
    * break the q149 index ≡ direct property for exactly that term. */
  private def collectTerms(queryTerms: DataFrame): Seq[String] =
    queryTerms.select("term").distinct()
      .collect().map(_.getString(0)).filter(_.nonEmpty).toSeq.sorted

  /** Scoring core over an ALREADY-vocabulary-filtered posting frame.
    * `post` has two consumers (df + contributions), so the posting
    * subtree evaluates twice — a second corpus scan on the direct
    * path. MEASURED dead end (same boot, quiet probes): a
    * localCheckpoint(true) here costs MORE than it saves on both
    * paths — q146 1.40→1.9 s (the eager materialization job beats
    * the cheap re-scan), q149 ~2.45 s unchanged (its store is
    * already materialized; re-filtering it is free). The 2-consumer
    * rule from BASELINE.md r5 holds: persist pays at ≥3 branches. */
  private def scoresCore(post: DataFrame, nDocs: Long, avgdl: Double,
                         queryTerms: DataFrame,
                         k1: Double, b: Double): DataFrame = {
    val dft = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = (lit(nDocs.toDouble) - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfD = col("tf").cast("double")
    val contrib = idf * (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl))))
    post
      .join(broadcast(dft), Seq("term"))
      .join(broadcast(queryTerms), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        graft.ops.Exact.duckRound(contrib, 6).cast(DecimalType(21, 10)).as("c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("sc"))
  }

  /** BM25 scores from a prebuilt full-vocabulary posting frame (the
    * persisted-index path — filtered here to the query vocabulary, a
    * pruned read on a term-partitioned store); nDocs/avgdl are the
    * corpus globals (model-sized, inlined — their sums are exact
    * integers so the double division is the same IEEE op an oracle
    * engine runs). `sc` is the exact DECIMAL(21,10) score (rank on
    * it); cast to double for display. */
  def bm25ScoresFromIndex(index: DataFrame, nDocs: Long, avgdl: Double,
                          queryTerms: DataFrame,
                          k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = collectTerms(queryTerms)
    scoresCore(index.filter(col("term").isin(terms: _*)),
      nDocs, avgdl, queryTerms, k1, b)
  }

  /** BM25 scores per (query_id, doc_id) over a (query_id, term) query
    * grid, straight off the corpus: posting lists are built for the
    * query vocabulary only (the pre-groupBy filter in [[postings]] —
    * the shuffle is O(matching postings), and no redundant re-filter
    * or second vocabulary collect happens downstream). */
  def bm25Scores(docs: DataFrame, queryTerms: DataFrame,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (nDocs, nTokens) = corpusTokenStats(docs)
    scoresCore(postings(docs, collectTerms(queryTerms)),
      nDocs, nTokens.toDouble / nDocs.toDouble, queryTerms, k1, b)
  }

  /** Rank a (query_id, doc_id, sc) score frame to top-k per query —
    * exposed so callers can filter scores before ranking (q148 drops
    * each seed from its own candidate set here, keeping both fusion
    * arms' rank spaces self-free and symmetric). */
  def rankTopK(scores: DataFrame, k: Int): DataFrame =
    scores
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sc").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("sc").cast("double").as("score"))

  /** Top-k retrieval: (query_id, rnk, doc_id, score) — rank over the
    * exact decimal score, doc_id tiebreak. The per-query window is
    * top-k-limited (WindowGroupLimit: partial before the exchange). */
  def bm25TopK(docs: DataFrame, queryTerms: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankTopK(bm25Scores(docs, queryTerms, k1, b), k)

  /** [[bm25TopK]] off a prebuilt index + merged stats (q149's
    * incremental-maintenance path). */
  def bm25TopKFromIndex(index: DataFrame, nDocs: Long, avgdl: Double,
                        queryTerms: DataFrame, k: Int,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankTopK(bm25ScoresFromIndex(index, nDocs, avgdl, queryTerms, k1, b), k)
}
