package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sinks.TableLog

/** A [[graft.sinks.TableLog]] table as a STREAMING SOURCE — the
  * read face of the Delta-as-a-stream contract whose write face is
  * `TableLog.exactlyOnceSink`: together they chain incremental
  * pipelines through durable, atomically-versioned tables (stage N
  * streams FROM the table stage N−1 streams INTO), each hop priced
  * at the delta.
  *
  *  - OFFSET = committed table VERSION (a long — versions are dense
  *    and monotone, the natural streaming offset). `getOffset`
  *    reads the head manifest; nothing is planned until a commit
  *    moves it.
  *  - BATCH (start, end] = [[TableLog.readAppendsSince]]: exactly
  *    the rows of the data files those append commits added, read
  *    from ONLY those files — O(new files) per micro-batch
  *    regardless of table size, and pinned (a commit racing the
  *    batch changes nothing it reads).
  *  - EXACTLY-ONCE downstream: offsets live in the query's
  *    checkpoint; a replayed batch re-reads the same immutable file
  *    set (version ranges are reproducible forever — the manifests
  *    are the metadata log Delta keeps for the same purpose).
  *  - NON-APPEND commits (compact / zorder / overwrite / merge)
  *    inside a batch range make the file diff not a row delta:
  *    `readAppendsSince` THROWS and the query fails loudly with a
  *    resume instruction — never silent double-reads (Delta's "data
  *    update detected" source error). Likewise a checkpointed offset
  *    BELOW the table's `expireVersions` floor fails loudly with the
  *    resume instruction — an expired manifest is a checked
  *    prerequisite, never a silent hole. Schedule maintenance around
  *    consumers, or restart the stream from a fresh checkpoint +
  *    `startingVersion`.
  *
  * Options: `path` (the table directory, required);
  * `startingVersion` (serve only appends AFTER this version; default
  * 0 = the table's whole history — the Delta option of the same
  * name); `readChangeFeed` (default false): CDF MODE — each batch is
  * `TableLog.readChanges(start, end]` instead of the append delta,
  * so the stream RIDES ACROSS delete and merge commits as signed
  * rows (−preimage/+postimage with `_change_type`/`_commit_version`
  * columns, Delta's readChangeFeed option) instead of failing;
  * compact/zorder contribute zero rows; overwrite/restore/clone
  * still fail loudly with the resume instruction (not
  * change-recoverable at O(Δ)). Checkpoint replays re-derive the
  * same signed rows from the same immutable files — offsets stay
  * versions, exactly-once composition unchanged;
  * `failOnSchemaEvolution` (default false — see below). The
  * served schema is pinned at query start (user-provided or the head
  * manifest's); a mid-stream schema evolution keeps serving the
  * pinned projection — evolved columns appear on a restart, never as
  * a mid-query shape change. With `failOnSchemaEvolution=true` the
  * query instead FAILS loudly the first time a batch's head schema
  * differs from the pinned one — for consumers that must never
  * silently drop a column a producer started sending. A USER-provided
  * schema (`readStream.schema(...)`) must be a type-equal subset of
  * the table's committed schema: the source projects columns by name
  * but never converts types, so a type-divergent user schema would
  * reinterpret the rows' binary layout — rejected at query start.
  *
  * Spark-facing registration: the legacy `StreamSourceProvider` API
  * (a Source returns each batch as a DataFrame — exactly what
  * readAppendsSince produces; the DSv2 MicroBatchStream would force
  * re-implementing a parquet reader). Use via
  * `spark.readStream.format("graft.streaming.TableLogSource")
  * .option("path", table).load()`.
  */
class TableLogSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-tablelog"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "TableLogSource: option 'path' (the TableLog table directory) is required"))

  /** The table's committed (or footer) schema at query start. */
  private def tableSchema(spark: SparkSession, table: String): StructType = {
    val m = TableLog.manifest(spark, table) // head must exist
    m.schema.getOrElse(TableLog.read(spark, table).schema)
  }

  /** Deep nullability-normalized type for the user-schema check —
    * nullability differences are not type differences. */
  private def norm(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = norm(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      org.apache.spark.sql.types.ArrayType(norm(a.elementType), true)
    case m: org.apache.spark.sql.types.MapType =>
      org.apache.spark.sql.types.MapType(norm(m.keyType), norm(m.valueType), true)
    case other => other
  }

  /** A user schema must be a TYPE-EQUAL subset of the table's —
    * `getBatch` projects by name without conversion, so a divergent
    * type would silently reinterpret the physical rows (int served
    * as long). Rejected here, at query start. */
  private def validated(user: StructType, table: StructType,
                        tablePath: String): StructType = {
    val byName = table.fields.map(f => f.name -> f.dataType).toMap
    val bad = user.fields.flatMap { f =>
      byName.get(f.name) match {
        case None => Some(s"${f.name} (not in the table schema)")
        case Some(dt) if norm(dt) != norm(f.dataType) =>
          Some(s"${f.name}: table ${dt.simpleString} vs requested ${f.dataType.simpleString}")
        case _ => None
      }
    }
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"TableLogSource: the user-provided stream schema is not a type-equal " +
        s"subset of $tablePath's committed schema — ${bad.mkString("; ")}. The " +
        s"source projects columns by name and never converts types; cast " +
        s"downstream instead.")
    user
  }

  /** The CDF-mode stream schema: the table's columns + the signed-row
    * markers `readChanges` emits. */
  private def cdfSchema(tbl: StructType): StructType =
    StructType(tbl.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)))

  private def cdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val table = tablePath(parameters)
    val tbl0 = tableSchema(sqlContext.sparkSession, table)
    val tbl = if (cdf(parameters)) cdfSchema(tbl0) else tbl0
    (shortName(), schema.map(validated(_, tbl, table)).getOrElse(tbl))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val table = tablePath(parameters)
    val starting = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
    val failOnEvolve = parameters.get("failOnSchemaEvolution")
      .exists(_.toBoolean)
    val spark = sqlContext.sparkSession
    val tbl0 = tableSchema(spark, table)
    val tbl = if (cdf(parameters)) cdfSchema(tbl0) else tbl0
    val pinned = schema.map(validated(_, tbl, table)).getOrElse(tbl)
    new TableLogStreamSource(spark, table, pinned, tbl, starting, failOnEvolve,
      changeFeed = cdf(parameters))
  }
}

private[streaming] class TableLogStreamSource(
    spark: SparkSession, table: String, pinned: StructType,
    initialTableSchema: StructType, startingVersion: Long,
    failOnSchemaEvolution: Boolean,
    changeFeed: Boolean = false) extends Source {

  override def schema: StructType = pinned

  /** Head version as the latest offset; None until a commit lands
    * past `startingVersion` (an idle table plans no batches). */
  override def getOffset: Option[OffsetV1] = {
    val head = TableLog.headVersion(spark, table)
    if (head <= startingVersion) None else Some(LongOffset(head))
  }

  // LongOffset.json is the bare number; after a checkpoint restart the
  // engine hands back a SerializedOffset with the same json — parsing
  // json covers both forms
  private def version(o: OffsetV1): Long = o.json.trim.toLong

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val since = start.map(version).getOrElse(startingVersion)
    val to = version(end)
    if (failOnSchemaEvolution) {
      val now0 = TableLog.manifest(spark, table, Some(to)).schema
      val now = (if (changeFeed) now0.map(s => StructType(s.fields ++
          initialTableSchema.fields.takeRight(2))) else now0)
        .getOrElse(initialTableSchema)
      if (now != initialTableSchema) throw new IllegalStateException(
        s"TableLogSource: $table's schema evolved mid-stream (pinned " +
          s"${initialTableSchema.simpleString}, table now ${now.simpleString}) " +
          s"and failOnSchemaEvolution=true — restart the query to pick up the " +
          s"new schema (the default policy keeps serving the pinned projection).")
    }
    val delta =
      if (changeFeed) TableLog.readChanges(spark, table, since, Some(to))
      else TableLog.readAppendsSince(spark, table, since, Some(to))
    // project to the PINNED schema (a mid-stream evolution must not
    // change the batch shape under a running query), then hand the
    // engine the streaming-flagged frame it asserts on
    val projected = delta.select(pinned.fields.toSeq.map(f =>
      org.apache.spark.sql.functions.col(f.name)): _*)
    org.apache.spark.sql.graftbridge.DatasetBridge.ofInternalRowsStreaming(
      spark, projected.queryExecution.toRdd, pinned)
  }

  override def stop(): Unit = ()

  override def toString: String = s"TableLogSource[$table, since=$startingVersion]"
}
