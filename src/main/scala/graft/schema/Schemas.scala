package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for every record shape the reference passes around
  * as untyped dicts (SURVEY.md §1.3). The reference's schema-drift bug
  * (place_id vs placeId, thumbnail_url vs thumbnail) is exactly what
  * declared schemas + boundary renames (Normalize.canonicalize)
  * prevent.
  */
object Schemas {

  /** Crawler output row (restaurant-crawler/restaurant-crawler.py:255-265). */
  val restaurant: StructType = StructType(Seq(
    StructField("place_id", StringType),
    StructField("name", StringType),
    StructField("thumbnail_url", StringType),
    StructField("category", StringType),
    StructField("page", IntegerType, nullable = false),
    StructField("origin_address", StringType),
    StructField("address", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)))

  /** Review row (review-crawler/naver_crawler.py:204-210); id is the
    * sha-256 surrogate key (Normalize.surrogateKey). */
  val review: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("place_id", StringType),
    StructField("author", StringType),
    StructField("content", StringType),
    StructField("visit_date", StringType)))

  /** RDS restaurant table (review-crawler/restaurant_save.py:15-23). */
  val rdsRestaurant: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType, nullable = false),
    StructField("address", StringType, nullable = false),
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false),
    StructField("thumbnail", StringType)))

  /** S3 ObjectCreated event (save-reviews/lambda_function.py:179-188):
    * nested Records[].s3.{bucket.name, object.key}, URL-encoded key. */
  val s3Event: StructType = StructType(Seq(
    StructField("Records", ArrayType(StructType(Seq(
      StructField("s3", StructType(Seq(
        StructField("bucket", StructType(Seq(StructField("name", StringType)))),
        StructField("object", StructType(Seq(StructField("key", StringType)))))))))))))

  /** API review payload (save-reviews/lambda_function.py:69-73). */
  val apiReview: StructType = StructType(Seq(
    StructField("restaurantId", IntegerType, nullable = false),
    StructField("content", StringType),
    StructField("hash", StringType)))
}

/** Typed counterparts for Dataset[T] boundaries. */
case class Restaurant(
    place_id: Option[String], name: Option[String],
    thumbnail_url: Option[String], category: Option[String], page: Int,
    origin_address: Option[String], address: Option[String],
    latitude: Option[Double], longitude: Option[Double])

case class Review(
    id: Option[String], place_id: Option[String], author: Option[String],
    content: Option[String], visit_date: Option[String])
