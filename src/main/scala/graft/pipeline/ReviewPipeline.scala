package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Normalize}

/** §3.3 entry points C+D re-expressed: review crawl → surrogate key →
  * intra-batch dedup → anti-join against ingested ids → (limit 10 →
  * API payload) for the save stage.
  */
object ReviewPipeline {

  /** O4 + ST3: attach the sha-256 surrogate id and drop intra-batch
    * duplicates (the reference's already_appended_ids set). */
  def withId(crawled: DataFrame): DataFrame =
    Dedup.byKey(
      crawled.withColumn("id",
        Normalize.surrogateKey(col("author"), col("content"), col("visit_date"))),
      Seq("id"))

  /** ST2 batch twin: only reviews whose id is not already ingested.
    * (The streaming form is EventStreams.statefulDedup with the id
    * set checkpointed per place_id.) */
  def newReviews(crawled: DataFrame, existingIds: DataFrame): DataFrame =
    Dedup.antiJoinKeys(withId(crawled), existingIds, "id")

  /** Save stage (entry point D): newest-first cap at `limit` rows per
    * batch (T1+T2), then the API projection (O6/O12). */
  def apiBatch(reviews: DataFrame, limit: Int = 10): DataFrame =
    Normalize.apiPayload(
      reviews.orderBy(col("visit_date").desc, col("id")).limit(limit))
}
