package graft.sources.v2

import java.io.{BufferedWriter, File, FileWriter}
import java.util

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** DataSourceV2 write path for the JSON-lines format — the
  * engine-grade version of the reference's S3 JSON sink (SURVEY.md
  * §2.7 K1, restaurant-crawler/storage_manager.py:44-45).
  *
  * The reference APPENDED by read-merge-overwrite of a whole object —
  * a lost-update race under concurrent writers. Here the write is the
  * standard two-phase commit of distributed sinks:
  *
  *  1. each task writes its partition to a hidden temp file
  *     (`.tmp-<uuid>-p<partition>`) and reports it in its commit
  *     message — speculative/retried tasks write DIFFERENT temp
  *     files;
  *  2. the driver's commit() renames exactly the reported temp files
  *     into place (`part-<n>-<uuid>.jsonl`) — uncommitted attempts
  *     are never visible, abort() deletes them.
  *
  * So concurrent appends interleave safely (distinct uuids), and
  * overwrite (SupportsTruncate) swaps the directory contents only
  * after every task has succeeded. One file per partition mirrors the
  * read side's partition-per-file contract.
  */
final class JsonLinesWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new JsonLinesWrite(schema, path, doTruncate)
}

final class JsonLinesWrite(schema: StructType, path: String, truncate: Boolean)
    extends Write with BatchWrite with StreamingWrite {
  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = this
  // both parent traits default this; Scala requires an explicit pick
  override def useCommitCoordinator(): Boolean = true

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    JsonLinesWriterFactory(schema, path)

  // ---- streaming epochs: exactly-once by deterministic file names.
  // A task writes part-e<epoch>-p<partition>.jsonl via temp+rename;
  // if a failure replays the epoch, commit sees the destination
  // already present and discards the replay — the file-level
  // idempotence that makes the sink safe under at-least-once task
  // execution (deterministic micro-batch input assumed, which
  // checkpointed sources provide).
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    JsonLinesStreamingFactory(schema, path)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    messages.collect { case m: JsonLinesCommit if m.rows > 0 =>
      val tmp = new File(m.tempPath)
      val dest = new File(dir, m.finalName)
      if (dest.exists()) { tmp.delete(); () } // epoch replayed: keep first commit
      else if (!tmp.renameTo(dest))
        throw new java.io.IOException(s"epoch $epochId commit rename failed: $tmp -> $dest")
    }
    messages.collect { case m: JsonLinesCommit if m.rows == 0 => new File(m.tempPath).delete() }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    abort(messages)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    if (truncate)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("."))
        .foreach(_.delete())
    messages.collect { case m: JsonLinesCommit if m.rows > 0 =>
      val tmp = new File(m.tempPath)
      val dest = new File(dir, m.finalName)
      if (!tmp.renameTo(dest))
        throw new java.io.IOException(s"commit rename failed: $tmp -> $dest")
    }
    // zero-row temp files: nothing was created, nothing to move
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: JsonLinesCommit => new File(m.tempPath).delete() }
}

final case class JsonLinesCommit(tempPath: String, finalName: String, rows: Long)
    extends WriterCommitMessage

final case class JsonLinesWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonLinesWriter(schema, path, partitionId, taskId)
}

final case class JsonLinesStreamingFactory(schema: StructType, path: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new JsonLinesWriter(schema, path, partitionId, taskId,
      finalNameOverride = Some(f"part-e$epochId%05d-p$partitionId%05d.jsonl"))
}

final class JsonLinesWriter(schema: StructType, path: String,
                            partitionId: Int, taskId: Long,
                            finalNameOverride: Option[String] = None)
    extends DataWriter[InternalRow] {
  private val mapper = new ObjectMapper()
  private val uuid = java.util.UUID.randomUUID().toString
  private val temp = new File(path, s".tmp-$uuid-p$partitionId")
  private var out: BufferedWriter = _
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      temp.getParentFile.mkdirs()
      out = new BufferedWriter(new FileWriter(temp, java.nio.charset.StandardCharsets.UTF_8))
    }
    val m = new util.LinkedHashMap[String, Any]()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      m.put(f.name,
        if (row.isNullAt(i)) null
        else f.dataType match {
          case LongType => row.getLong(i)
          case IntegerType => row.getInt(i)
          case DoubleType => row.getDouble(i)
          case BooleanType => row.getBoolean(i)
          case StringType => row.getUTF8String(i).toString
          case dt => throw new UnsupportedOperationException(
            s"jsonl sink: unsupported type ${dt.simpleString} for '${f.name}'")
        })
    }
    out.write(mapper.writeValueAsString(m)); out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    JsonLinesCommit(temp.getAbsolutePath,
      finalNameOverride.getOrElse(f"part-$partitionId%05d-$uuid.jsonl"), rows)
  }

  override def abort(): Unit = { if (out != null) out.close(); temp.delete() }
  override def close(): Unit = ()
}
