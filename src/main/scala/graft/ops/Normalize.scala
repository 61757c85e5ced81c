package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level normalization operators — the reference's scalar
  * surface (SURVEY.md §2.2) re-expressed as codegen'd Spark built-ins.
  * No UDFs anywhere: every op stays inside whole-stage codegen.
  *
  * Reference citations (behavioral source, /root/reference):
  *  - cleanAddress:  restaurant-crawler/restaurant-crawler.py:20-37 (O2)
  *  - placeIdFromUrl: restaurant-crawler/restaurant-crawler.py:190-198 (O3)
  *  - surrogateKey:  review-crawler/naver_crawler.py:172-177 (O4)
  *  - castWithDefault: save-reviews/lambda_function.py:71 (O6)
  *  - fillSinkDefaults: review-crawler/restaurant_save.py:96-113 (O7)
  *  - urlDecodeKey:  save-reviews/lambda_function.py:43 (O10)
  *  - apiPayload:    save-reviews/lambda_function.py:69-73 (O12)
  *  - preview:       review-crawler/naver_crawler.py:327 (O13)
  */
object Normalize {

  /** Korean road-address cleaner (O2): keep the admin-region prefix +
    * road + building number, drop the detail suffix; fall back to the
    * raw input when the pattern misses (reference returns the input
    * unchanged on regex miss).
    */
  val roadAddressPattern: String =
    "([가-힣]+(?:특별시|광역시|시|도)\\s*[가-힣]+(?:시|군|구)\\s*[가-힣0-9]*(?:읍|면|동|로|길)[^,]*?\\d+(?:-\\d+)?)"

  def cleanAddress(c: Column): Column = {
    val extracted = trim(regexp_extract(c, roadAddressPattern, 1))
    when(extracted === "", c).otherwise(extracted)
  }

  /** Generic regex-extract-with-fallback: the O2 semantics (use the
    * match if any, else pass the input through) over any pattern. */
  def extractOrSelf(c: Column, pattern: String, group: Int = 0): Column = {
    val extracted = trim(regexp_extract(c, pattern, group))
    when(extracted === "", c).otherwise(extracted)
  }

  /** O3: `/place/(\d+)` → place_id (empty string on miss, as the
    * reference's `re.search` returning None maps to null-ish). */
  def placeIdFromUrl(c: Column): Column =
    regexp_extract(c, "/place/(\\d+)", 1)

  /** O4: sha256(a|b|c) surrogate key — exact reference formula
    * `sha256(author + "|" + content + "|" + visit_date)`. */
  def surrogateKey(cols: Column*): Column =
    sha2(concat_ws("|", cols: _*), 256)

  /** O6: string → int with default (reference `int(x or 0)`).
    * The numeric-shape guard keeps malformed input tolerant under
    * ANSI mode (Spark 4 default) instead of failing the task —
    * try_cast semantics via public API. */
  def castWithDefault(c: Column, default: Int): Column =
    coalesce(
      when(c.rlike("^\\s*[+-]?[0-9]{1,9}\\s*$"), c).cast("int"),
      lit(default))

  /** O7: the RDS sink's null-coalescing defaults. */
  def fillSinkDefaults(df: DataFrame): DataFrame =
    df.na.fill(Map("address" -> "", "latitude" -> 0.0, "longitude" -> 0.0))

  /** O10: URL-decode object keys (`unquote_plus`). */
  def urlDecodeKey(c: Column): Column = url_decode(c)

  /** O12: API payload projection {place_id→restaurantId, id→hash}. */
  def apiPayload(df: DataFrame): DataFrame =
    df.select(
      castWithDefault(col("place_id"), 0).as("restaurantId"),
      col("content"),
      col("id").as("hash"))

  /** O13: bounded display preview. */
  def preview(c: Column, n: Int = 50): Column = substring(c, 1, n)

  /** §1.2 schema-drift repair: canonicalize the camelCase/snake_case
    * drift the reference ships (placeId vs place_id, thumbnail vs
    * thumbnail_url) into one schema via explicit renames. */
  def canonicalize(df: DataFrame): DataFrame = {
    val renames = Map(
      "placeId" -> "place_id",
      "thumbnail" -> "thumbnail_url")
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from) && !d.columns.contains(to))
        d.withColumnRenamed(from, to)
      else d
    }
  }
}
