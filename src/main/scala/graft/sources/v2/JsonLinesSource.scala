package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 JSON-lines source with column-pruning and filter
  * pushdown — the engine-grade version of the reference's S3 Select
  * scan (SURVEY.md §2.1 S2, restaurant-crawler/storage_manager.py:50-87).
  *
  * The reference ran `SELECT * FROM S3Object[*]` server-side and then
  * projected client-side — pushing neither the projection nor any
  * predicate. Here both travel through the V2 pushdown hooks into the
  * partition reader, which evaluates them per line BEFORE building
  * rows: the scan returns only required columns of matching rows,
  * exactly what a remote S3-Select-style endpoint would be asked for.
  * Pushed filters are also reported back as residuals, so Spark
  * re-applies them — pushdown here is an optimization, never a
  * correctness dependency.
  *
  * Partitioning: one input partition per file (a crawl batch file =
  * the reference's unit of work). Usage:
  * `spark.read.format("graft.sources.v2.JsonLinesSource").schema(s).load(dir)`.
  */
class JsonLinesSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft jsonl source requires an explicit .schema(...) (schemas are declared, never guessed — SURVEY.md §1.2)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new JsonLinesTable(schema, properties.get("path"))
}

final class JsonLinesTable(schema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-jsonl($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonLinesScanBuilder(schema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JsonLinesWriteBuilder(info.schema(), path)
}

final class JsonLinesScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(FilterEval.supported)
    filters // all residual: Spark re-applies (defense in depth)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new JsonLinesScan(fullSchema, required, pushed, path)
}

final class JsonLinesScan(fullSchema: StructType, required: StructType,
                          pushed: Array[Filter], path: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-jsonl PushedFilters: [${pushed.mkString(", ")}], ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] =
    JsonLinesScan.listFiles(path).map(JsonLinesPartition(_): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonLinesReaderFactory(fullSchema, required, pushed)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new JsonLinesMicroBatchStream(fullSchema, required, pushed, path)
}

object JsonLinesScan {
  /** Stable file listing: a directory's visible data files sorted by
    * absolute path (crawl batch files are append-only and
    * lexically increasing, so the order is the arrival order). */
  def listFiles(path: String): Array[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(x => x.isFile && !x.getName.startsWith(".")
        && !x.getName.startsWith("_")).map(_.getAbsolutePath).sorted
    else Array(path)
  }
}

/** Cumulative file-set offset: the source's high-watermark is the
  * sorted list of files already delivered. Serialized into Spark's
  * checkpoint offset log, so a restarted query resumes from the last
  * committed batch and [[JsonLinesMicroBatchStream.planInputPartitions]]
  * plans ONLY files past the watermark — the first-class spelling of
  * the ST2 stop-on-seen contract (SURVEY.md §2.8; the reference's
  * incremental review crawl re-fetched until it hit a seen review id,
  * review-crawler/naver_crawler.py:242-247). Files are treated as
  * append-only immutable crawl batches: deletions never rewind the
  * watermark, and in-place appends to an already-delivered file are
  * NOT re-read (write a new batch file instead — the same contract as
  * the reference's dated batch objects). */
final case class JsonFilesOffset(files: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    new ObjectMapper().writeValueAsString(files.sorted)
}

object JsonFilesOffset {
  def fromJson(j: String): JsonFilesOffset =
    JsonFilesOffset(new ObjectMapper().readValue(j, classOf[Array[String]]))
}

/** Micro-batch read path: each trigger delivers the files that
  * appeared since the previous offset, one input partition per new
  * file, through the SAME pruned/pushed reader the batch scan uses
  * (column pruning and filter pushdown are decided in the ScanBuilder
  * before this stream is created, so they apply per micro-batch). */
final class JsonLinesMicroBatchStream(fullSchema: StructType,
                                      required: StructType,
                                      pushed: Array[Filter], path: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  /** Trigger.AvailableNow contract: snapshot the listing at query
    * start; every batch up to termination reads toward THIS cap, so
    * files landing mid-run wait for the next incarnation (which
    * resumes from the committed offset). */
  private var availableNowCap: Option[Array[String]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(JsonLinesScan.listFiles(path))

  override def initialOffset(): Offset = JsonFilesOffset(Array.empty)

  override def latestOffset(): Offset =
    JsonFilesOffset(availableNowCap.getOrElse(JsonLinesScan.listFiles(path)))

  // SupportsAdmissionControl: this source has no rate limiting — every
  // known file is admitted each batch (a crawl batch file is small by
  // construction; rate control belongs to the producer's batch size).
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    latestOffset()
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    JsonFilesOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[JsonFilesOffset].files.toSet
    end.asInstanceOf[JsonFilesOffset].files
      .filterNot(seen).sorted
      .map(JsonLinesPartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonLinesReaderFactory(fullSchema, required, pushed)

  /** The offset log IS the watermark store — nothing else to commit. */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class JsonLinesPartition(file: String) extends InputPartition

final class JsonLinesReaderFactory(fullSchema: StructType, required: StructType,
                                   pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonLinesReader(partition.asInstanceOf[JsonLinesPartition].file,
      fullSchema, required, pushed)
}

final class JsonLinesReader(file: String, fullSchema: StructType,
                            required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val lines = scala.io.Source.fromFile(file, "UTF-8")
  private val it = lines.getLines()
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (it.hasNext) {
      val line = it.next().trim
      if (line.nonEmpty) {
        val parsed = parse(line)
        if (pushed.forall(FilterEval.eval(_, parsed))) {
          current = project(parsed)
          return true
        }
      }
    }
    false
  }

  /** Parse one JSON line into (field → typed value) per the declared
    * schema; unparseable / missing / mistyped fields → null
    * (PERMISSIVE-mode semantics, the F5 policy). */
  private def parse(line: String): Map[String, Any] =
    try {
      val m = mapper.readValue(line, classOf[util.Map[String, Object]]).asScala
      fullSchema.fields.map { f =>
        f.name -> convert(m.get(f.name).orNull, f.dataType)
      }.toMap
    } catch { case _: Exception => fullSchema.fields.map(_.name -> null).toMap }

  private def convert(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (x: Number, LongType) => x.longValue()
    case (x: Number, IntegerType) => x.intValue()
    case (x: Number, DoubleType) => x.doubleValue()
    case (x: java.lang.Boolean, BooleanType) => x.booleanValue()
    case (x, StringType) => x.toString
    case _ => null
  }

  private def project(row: Map[String, Any]): InternalRow =
    new GenericInternalRow(required.fields.map { f =>
      row(f.name) match {
        case null => null
        case s: String => UTF8String.fromString(s)
        case other => other
      }
    }.asInstanceOf[Array[Any]])

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

/** Client-side evaluation of the pushed filter subset. */
object FilterEval {
  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNotNull | _: IsNull => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  def eval(f: Filter, row: Map[String, Any]): Boolean = f match {
    case EqualTo(a, v)            => cmp(row.get(a).flatMap(Option(_)), v).contains(0)
    case GreaterThan(a, v)        => cmp(row.get(a).flatMap(Option(_)), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(row.get(a).flatMap(Option(_)), v).exists(_ >= 0)
    case LessThan(a, v)           => cmp(row.get(a).flatMap(Option(_)), v).exists(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(row.get(a).flatMap(Option(_)), v).exists(_ <= 0)
    case IsNotNull(a)             => row.get(a).exists(_ != null)
    case IsNull(a)                => row.get(a).forall(_ == null)
    case And(l, r)                => eval(l, row) && eval(r, row)
    case Or(l, r)                 => eval(l, row) || eval(r, row)
    case Not(c)                   => !eval(c, row)
    case _                        => true // unsupported: let Spark decide
  }

  /** None when the row value is null (SQL three-valued logic ⇒ filter
    * comparisons against null are not satisfied). */
  private def cmp(rowVal: Option[Any], filterVal: Any): Option[Int] = rowVal.map {
    case x: Long => java.lang.Long.compare(x, filterVal.asInstanceOf[Number].longValue())
    case x: Int => java.lang.Integer.compare(x, filterVal.asInstanceOf[Number].intValue())
    case x: Double => java.lang.Double.compare(x, filterVal.asInstanceOf[Number].doubleValue())
    case x: Boolean => java.lang.Boolean.compare(x, filterVal.asInstanceOf[Boolean])
    case x: String => x.compareTo(String.valueOf(filterVal))
    case _ => Int.MaxValue
  }
}
