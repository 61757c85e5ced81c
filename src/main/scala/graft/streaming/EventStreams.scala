package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ops.Exact

/** Structured Streaming surface (SURVEY.md §2.8).
  *
  * The reference's "streaming" is Lambda-per-S3-upload; here the same
  * semantics are first-class Structured Streaming:
  *  - ST1 file-arrival trigger  → file source + Trigger.AvailableNow
  *  - ST2 incremental stop-on-seen → checkpointed state
  *    (statefulDedup) — the engine-side generalization of "stop when
  *    an already-known review id appears"
  *  - ST3 intra-batch dedup     → dropDuplicates within the stream
  *  - ST4/ST5 at-least-once + idempotent replay → foreachBatch with
  *    idempotent (hash-keyed) sinks, watermarks bound state
  *
  * Every transform here is identical for batch and streaming frames —
  * callers pass either and Catalyst plans accordingly (the batch twins
  * are what the DuckDB oracle checks; StreamingSpec checks the
  * streaming execution produces the same rows).
  */
object EventStreams {

  /** ST1: file-arrival source — each new file in `dir` is an event. */
  def jsonFileSource(spark: SparkSession, dir: String, schema: StructType,
                     maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("multiLine", "true")
      .json(dir)

  /** Tumbling 1h window aggregate with a 10m watermark: the streaming
    * twin of q20 (same buckets, same exact-decimal sums). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming rate-anomaly flags — q152's monitoring rule on a live
    * stream under the frozen-model contract (the SemanticStream /
    * q117 pattern): per-type (mean, sd) come from a batch pass over
    * history and join the windowed counts as a static broadcast side,
    * so each hour's verdict costs one in-window count plus a 5-row
    * join — no historical rescan in the stream. Same exact-component
    * arithmetic and flag boundary as the batch q152 (StreamingSpec
    * pins set-equality of the flags under shared stats). */
  def rateAnomalyFlags(events: DataFrame, stats: DataFrame,
                       nSigma: Double = 3.0): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(stats), Seq("event_type"))
      .filter(col("cnt").cast("double") > col("mean") + lit(nSigma) * col("sd"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("cnt"),
        Exact.duckRound(when(col("sd") =!= 0,
          (col("cnt").cast("double") - col("mean")) / col("sd")), 4).as("z"))

  /** Sliding 1h/30m window twin of q21. */
  def slidingRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("n"), col("sum_value"))

  /** Session windows (30m gap) — the built-in streaming analog of the
    * batch sessionization (q22). */
  def sessionRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"), col("sum_value"))

  final case class Keyed(key: String, id: String)
  final case class SeenState(ids: Set[String])

  /** ST2/ST3 generalized: cross-batch stateful dedup. Emits only ids
    * never seen before for the key; per-key seen-set lives in
    * checkpointed state (the engine form of the reference's
    * "existing_ids" high-watermark; for monotonically increasing ids
    * the state could shrink to max-id, but review ids are hashes, so a
    * set is the honest contract — bounded by watermark/timeout in a
    * production deployment).
    */
  def statefulDedup(ds: Dataset[Keyed]): Dataset[Keyed] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Keyed], state: GroupState[SeenState]) => {
          val seen = state.getOption.map(_.ids).getOrElse(Set.empty)
          val batchNew = scala.collection.mutable.LinkedHashSet.empty[String]
          rows.foreach { r => if (!seen.contains(r.id)) batchNew += r.id }
          state.update(SeenState(seen ++ batchNew))
          batchNew.iterator.map(Keyed(key, _))
        })
  }

  final case class TimedKeyed(key: String, id: String, ts: java.sql.Timestamp)

  /** statefulDedup with a TTL: per-key seen-sets expire via event-time
    * timeout once the watermark passes last-seen + ttl. This is the
    * production contract at 100 TB — dedup state is bounded by the
    * TTL window, not by history; an id replayed AFTER its window
    * re-emits (the deliberate at-least-once trade every TTL'd dedup
    * makes; the idempotent sha-keyed sinks downstream absorb it). */
  def statefulDedupTtl(ds: Dataset[TimedKeyed], ttl: String,
                       watermarkDelay: String = "10 seconds"): Dataset[TimedKeyed] = {
    import ds.sparkSession.implicits._
    val ttlMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    // A months component has no fixed millisecond width; silently
    // ignoring it would yield ttlMillis=0 and instant state expiry.
    require(ttlMs.months == 0,
      s"TTL '$ttl' has a calendar months component; use days/hours/minutes")
    val ttlMillis = ttlMs.days * 86400000L + ttlMs.microseconds / 1000L
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[TimedKeyed], state: GroupState[SeenState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val seen = state.getOption.map(_.ids).getOrElse(Set.empty)
            val out = scala.collection.mutable.ListBuffer.empty[TimedKeyed]
            var maxTs = 0L
            rows.foreach { r =>
              maxTs = math.max(maxTs, r.ts.getTime)
              if (!seen.contains(r.id) && !out.exists(_.id == r.id)) out += r
            }
            state.update(SeenState(seen ++ out.map(_.id)))
            state.setTimeoutTimestamp(maxTs + ttlMillis)
            out.iterator
          }
        })
  }

  /** statefulDedupTtl on Spark 4's transformWithState (state API v2):
    * the per-key seen-set is a native ListState carrying a built-in
    * TTLConfig — element expiry is managed by the state store itself
    * (requires the RocksDB provider), replacing the hand-rolled
    * EventTimeTimeout arithmetic and the interval-parsing bug class
    * it carries. Same contract as statefulDedup/-Ttl: emit ids never
    * seen (within the TTL window) for the key; duplicates within one
    * batch dedup too. */
  final class TtlDedupProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[String, TimedKeyed, TimedKeyed] {
    @transient private var seen: ListState[String] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[String]("seen",
        org.apache.spark.sql.Encoders.STRING,
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))
    override def handleInputRows(key: String, rows: Iterator[TimedKeyed],
                                 timerValues: TimerValues): Iterator[TimedKeyed] = {
      val known = scala.collection.mutable.HashSet.empty[String]
      seen.get().foreach(known += _)
      val out = scala.collection.mutable.ListBuffer.empty[TimedKeyed]
      rows.foreach { r =>
        if (known.add(r.id)) { out += r; seen.appendValue(r.id) }
      }
      out.iterator
    }
  }

  /** Cross-batch TTL'd dedup via transformWithState. `ttl = null`
    * keeps state forever (the statefulDedup twin). Deployment note:
    * with a processing-time TTL the operator schedules maintenance
    * batches indefinitely, so `Trigger.AvailableNow` +
    * `awaitTermination` never returns — run continuously (the
    * production shape) or drain with `processAllAvailable` + `stop`
    * (StreamingSpec). TTL expiry applies on state READ, so a
    * restarted query sees expired elements filtered either way. */
  def statefulDedupTws(ds: Dataset[TimedKeyed],
                       ttl: java.time.Duration = null): Dataset[TimedKeyed] = {
    import ds.sparkSession.implicits._
    // TTL state requires the ProcessingTime time mode; without a TTL,
    // TimeMode.None keeps the query drainable by AvailableNow (no
    // maintenance batches are ever scheduled)
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(_.key)
      .transformWithState(new TtlDedupProcessor(ttl), mode, OutputMode.Append())
  }

  /** Built-in within-watermark dedup — completes the dedup triad
    * (exact cross-batch: statefulDedup; TTL'd custom state:
    * statefulDedupTtl; built-in bounded: this). State is evicted by
    * the watermark automatically; duplicates arriving farther apart
    * than the delay may re-emit, same trade as the TTL variant. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** A2's streaming analog: observable metrics ride the query —
    * per-batch row/error counts surface through QueryProgress without
    * a second aggregation pass over the stream. */
  def observed(events: DataFrame): DataFrame =
    events.observe("graft_metrics",
      count(lit(1)).as("n_rows"),
      count(when(col("event_type") === "error", lit(1))).as("n_errors"))

  /** Stream-stream interval join — the streaming counterpart of the
    * batch range join (ops/RangeJoin): each purchase joins the same
    * user's clicks from the preceding 10 minutes. Watermarks on BOTH
    * sides are what make this bounded: a buffered click older than
    * the purchase-side watermark minus the interval can never match
    * again, so Spark evicts it — state is O(users x 10min of clicks),
    * not O(history). Identical expression works on batch frames
    * (StreamingSpec proves result equality). */
  def intervalJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
      col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("p_user").as("user_id"), col("c_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Run any streaming frame to completion over currently-available
    * input (the batch-ish trigger the reference's per-upload Lambda
    * maps to), delivering each micro-batch to `sink`. */
  def runAvailableNow(df: DataFrame, checkpointDir: String,
                      outputMode: OutputMode = OutputMode.Append)
                     (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val q = df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(sink)
      .start()
    q.awaitTermination()
    q
  }

  /** Memory-sink runner for tests/inspection: returns the table name. */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream.outputMode(outputMode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
