package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Corpus table loaders (TESTDATA.md). Single place that knows the
  * on-disk layout so queries stay layout-agnostic. Reads are plain
  * parquet scans: Catalyst pushes filters/projections into the scan
  * (visible as PushedFilters/ReadSchema in explain), which at 100 TB
  * is the difference between reading a column slice and the world.
  *
  * PATH CONTRACT — scheme-agnostic by construction: `dir` is any URI
  * Hadoop can resolve (`file:`, `hdfs:`, `s3a:`, ...), because every
  * read goes through `spark.read` → `FileSystem.get(uri, conf)`.
  * Object stores need only their connector on the classpath and the
  * scheme registered, e.g. for S3: the hadoop-aws module plus
  * `spark.hadoop.fs.s3a.impl=org.apache.hadoop.fs.s3a.S3AFileSystem`
  * (+ credentials provider config) — then
  * `Tables.documents(spark, "s3a://bucket/corpus/sf100")` works
  * unchanged. SourcesSpec proves the contract with an in-test
  * FileSystem registered under a fake `grafts3` scheme and asserts
  * the bytes flow through it, not through a `file:` fallback.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.parquet has shipped two physical spellings of `ts`:
    * TIMESTAMP(NANOS) — which Spark's parquet reader rejects, so
    * sessions set spark.sql.legacy.parquet.nanosAsLong and the column
    * arrives as LongType nanos, truncated here to micros (the same
    * ns→us conversion DuckDB applies; verified: floor, not round) —
    * and plain micros with isAdjustedToUTC=false, which Spark reads
    * as TIMESTAMP_NTZ. Sessions pin spark.sql.session.timeZone=UTC,
    * so the NTZ→TIMESTAMP cast relabels the same micros value that
    * DuckDB's naive read sees; every downstream unix_micros /
    * date_format(…, UTC) then agrees across engines. Idempotent:
    * matches on the INPUT's type, already-TimestampType passes
    * through. */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(apply(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register all corpus tables as temp views so `spark.sql` works
    * too. Idempotent per (session, dir): repeated calls with the same
    * dir skip the 10 parquet-footer reads; a dir CHANGE re-registers
    * (views always reflect the last requested dir). Temp views are
    * per-SparkSession, so the cache key is the session OBJECT (a
    * WeakHashMap: reference identity, no identityHashCode collisions,
    * and entries evict when a session is GC'd instead of leaking) —
    * keying by applicationId would silently skip registration for a
    * second session (spark.newSession()) in the same application. */
  private val lastRegistered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  def register(spark: SparkSession, dir: String): Unit = {
    val prev = lastRegistered.put(spark, dir)
    if (prev != dir)
      all.foreach { n =>
        // events goes through the normalizing accessor so SQL-path
        // queries see the micros TimestampType column, not raw nanos
        val df = if (n == "events") events(spark, dir) else apply(spark, dir, n)
        df.createOrReplaceTempView(n)
      }
  }
}
