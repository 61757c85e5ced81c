package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** S3 ObjectCreated event handling (SURVEY.md §2.1 S7, §2.2 O10,
  * §2.4 U4): nested Records[] exploded to one row per object, with
  * URL-decoded keys — the reference's
  * `for record in event["Records"]: unquote_plus(record.s3.object.key)`
  * (submit-aws-batch-lambda/lambda_function.py:33-37).
  */
object S3Events {

  /** Parse raw event-JSON strings into (bucket, key) rows. */
  def objects(rawJson: DataFrame, jsonCol: String = "value"): DataFrame =
    rawJson
      .select(from_json(col(jsonCol), Schemas.s3Event).as("e"))
      .select(explode(col("e.Records")).as("r"))
      .select(
        col("r.s3.bucket.name").as("bucket"),
        url_decode(col("r.s3.object.key")).as("key"))
}
