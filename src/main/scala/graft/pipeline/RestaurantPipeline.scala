package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Normalize, Validate}

/** §3.1 entry point A re-expressed: crawl batch → normalize →
  * validate → anti-join against known keys → append.
  *
  * The reference runs this as 4 async page tasks + a Python set-based
  * anti-join + whole-file rewrite; here pages are just partitions of
  * one DataFrame and the anti-join broadcasts the key set. The crawler
  * itself (Playwright) is external ingestion — the engine-side
  * contract starts at a DataFrame with Schemas.restaurant.
  */
object RestaurantPipeline {

  /** O1-O3 + drift repair: canonical column names, crawl defaults
    * (name → "이름 없음", category/thumbnail → ""), cleaned address,
    * place_id backfilled from URL when a `url` column is present. */
  def normalize(raw: DataFrame): DataFrame = {
    val canon = Normalize.canonicalize(raw)
    val withId =
      if (canon.columns.contains("url") && canon.columns.contains("place_id"))
        canon.withColumn("place_id",
          coalesce(col("place_id"), Normalize.placeIdFromUrl(col("url"))))
      else canon
    withId
      .withColumn("name", coalesce(col("name"), lit("이름 없음")))
      .withColumn("category", coalesce(col("category"), lit("")))
      .withColumn("thumbnail_url", coalesce(col("thumbnail_url"), lit("")))
      .withColumn("address", Normalize.cleanAddress(coalesce(col("address"), col("origin_address"))))
  }

  /** Full stage: returns (newValidRows, deadLetter). */
  def run(freshCrawl: DataFrame, existingKeys: DataFrame): (DataFrame, DataFrame) = {
    val (valid, dead) = Validate.split(normalize(freshCrawl), Seq("place_id", "name"))
    (Dedup.antiJoinKeys(valid, existingKeys, "place_id"), dead)
  }
}
