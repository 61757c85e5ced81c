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
  *    update detected" source error). Schedule maintenance around
  *    consumers, or restart the stream from a fresh checkpoint +
  *    `startingVersion`.
  *
  * Options: `path` (the table directory, required);
  * `startingVersion` (serve only appends AFTER this version; default
  * 0 = the table's whole history — the Delta option of the same
  * name). The served schema is pinned at query start (user-provided
  * or the head manifest's); a mid-stream schema evolution keeps
  * serving the pinned projection — evolved columns appear on a
  * restart, never as a mid-query shape change.
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

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val table = tablePath(parameters)
    val resolved = schema.getOrElse {
      val m = TableLog.manifest(sqlContext.sparkSession, table) // head must exist
      m.schema.getOrElse(TableLog.read(sqlContext.sparkSession, table).schema)
    }
    (shortName(), resolved)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val table = tablePath(parameters)
    val starting = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
    val pinned = sourceSchema(sqlContext, schema, providerName, parameters)._2
    new TableLogStreamSource(sqlContext.sparkSession, table, pinned, starting)
  }
}

private[streaming] class TableLogStreamSource(
    spark: SparkSession, table: String, pinned: StructType,
    startingVersion: Long) extends Source {

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
    val delta = TableLog.readAppendsSince(spark, table, since, Some(to))
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
