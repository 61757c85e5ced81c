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

  /** BM25 scores per (query_id, doc_id) over a (query_id, term) query
    * grid. Only documents matching at least one query term appear.
    * `sc` is the exact DECIMAL(21,10) score (rank on it); cast to
    * double for display. */
  def bm25Scores(docs: DataFrame, queryTerms: DataFrame,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // model-sized scalars (N, avgdl), collected once and inlined —
    // the MLlib-fit pattern; sums are exact integers so the double
    // division is the same IEEE op an oracle engine runs
    val st = docs.agg(
      sum(size(split(col("text"), " ")).cast("long")).as("s"),
      count(lit(1)).as("n")).first()
    val nDocs = st.getLong(1)
    val avgdl = st.getLong(0).toDouble / nDocs.toDouble
    val terms = queryTerms.select("term").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val post = postings(docs, terms)
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

  /** Top-k retrieval: (query_id, rnk, doc_id, score) — rank over the
    * exact decimal score, doc_id tiebreak. The per-query window is
    * top-k-limited (WindowGroupLimit: partial before the exchange). */
  def bm25TopK(docs: DataFrame, queryTerms: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(docs, queryTerms, k1, b)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sc").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("sc").cast("double").as("score"))
}
