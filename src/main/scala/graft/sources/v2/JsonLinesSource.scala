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

/** Pushed aggregate shapes the source can compute per file: the
  * storage-side COUNT/MIN/MAX the reference issued as S3-Select SQL
  * (restaurant-crawler/storage_manager.py:57-64). Partial pushdown:
  * each file partition emits its per-group partials and Spark plans
  * the final merge (sum of counts, min of mins, max of maxes), which
  * is exactly the distributed shape a 100 TB manifest scan wants —
  * the bytes never leave the storage side, only group rows do. */
private[v2] sealed trait AggSpec { def resultType: DataType }
private[v2] case object CountStarSpec extends AggSpec { val resultType: DataType = LongType }
private[v2] final case class CountColSpec(col: String) extends AggSpec { val resultType: DataType = LongType }
private[v2] final case class MinSpec(col: String, resultType: DataType) extends AggSpec
private[v2] final case class MaxSpec(col: String, resultType: DataType) extends AggSpec

/** One pushed ORDER BY key: top-level column, direction, null order. */
private[v2] final case class SortKey(col: String, descending: Boolean,
                                     nullsFirst: Boolean)

/** Shared value comparison for the per-file partial agg and top-N
  * readers. UTF-8 binary order for strings (Spark's UTF8String
  * order), NOT String.compareTo: UTF-16 code-unit order disagrees
  * above the BMP, and a wrong per-file partial cannot be repaired by
  * the final merge/sort. */
private[v2] object RowOrder {
  def cmpVals(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)       => java.lang.Long.compare(x, y)
    case (x: Int, y: Int)         => java.lang.Integer.compare(x, y)
    case (x: Double, y: Double)   => java.lang.Double.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: String, y: String) =>
      UTF8String.fromString(x).compareTo(UTF8String.fromString(y))
    case _                        => 0
  }

  /** Row ordering under the pushed keys — the first N rows of the
    * query's ORDER BY are exactly the N minima of this ordering. */
  def keyOrdering(keys: Seq[SortKey]): Ordering[Map[String, Any]] =
    (r1: Map[String, Any], r2: Map[String, Any]) => {
      var i = 0
      var c = 0
      while (c == 0 && i < keys.length) {
        val k = keys(i)
        val (a, b) = (r1(k.col), r2(k.col))
        c = (a, b) match {
          case (null, null) => 0
          case (null, _)    => if (k.nullsFirst) -1 else 1
          case (_, null)    => if (k.nullsFirst) 1 else -1
          case _            => if (k.descending) -cmpVals(a, b) else cmpVals(a, b)
        }
        i += 1
      }
      c
    }
}

final class JsonLinesScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, SortDirection, NullOrdering}
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var aggPushed: Option[(Seq[String], Seq[AggSpec])] = None
  private var limitPushed: Option[Int] = None
  private var topNPushed: Option[(Seq[SortKey], Int)] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(FilterEval.supported)
    filters // all residual: Spark re-applies (defense in depth)
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def fieldOf(e: Expression): Option[StructField] = e match {
    case f: NamedReference if f.fieldNames.length == 1 =>
      fullSchema.fields.find(_.name == f.fieldNames.head)
    case _ => None
  }

  /** Accept the aggregation only when EVERY function and group key
    * translates — a half-pushed aggregate would make Spark's final
    * merge wrong. Residual-filter note: because pushFilters reports
    * every filter residual, Spark only offers aggregates when no
    * filter sits between the aggregate and the scan. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val groups = agg.groupByExpressions().toSeq.map(fieldOf)
    val funcs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(CountStarSpec)
      case c: Count if !c.isDistinct =>
        fieldOf(c.column).map(f => CountColSpec(f.name))
      case m: Min => fieldOf(m.column).map(f => MinSpec(f.name, f.dataType))
      case m: Max => fieldOf(m.column).map(f => MaxSpec(f.name, f.dataType))
      case _ => None
    }
    if (groups.forall(_.isDefined) && funcs.forall(_.isDefined)) {
      aggPushed = Some((groups.flatten.map(_.name), funcs.flatten))
      true
    } else false
  }

  /** LIMIT n with nothing between it and the scan: each file reader
    * stops after its first n matching rows. PARTIAL by construction
    * (n per file, not globally), so Spark keeps the global limit —
    * pushdown is an optimization, never a correctness dependency,
    * same stance as the residual filters. */
  override def pushLimit(limit: Int): Boolean = {
    limitPushed = Some(limit)
    true
  }

  /** ORDER BY … LIMIT n: each file reader keeps an n-bounded heap
    * under the pushed keys and ships only its per-file top n — the
    * storage side answers "SELECT … ORDER BY k LIMIT n" per object,
    * Spark merges the per-file candidates with its global
    * TakeOrdered. Accepted only when EVERY key is a plain top-level
    * column of an atomic type; anything else declines and Spark
    * plans the full sort. */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
                        limit: Int): Boolean = {
    val keys = orders.toSeq.map { so =>
      fieldOf(so.expression()).collect {
        // exactly the types RowOrder.cmpVals orders — anything else
        // must decline rather than sort wrong
        case f if Seq(LongType, IntegerType, DoubleType, BooleanType,
            StringType).contains(f.dataType) =>
          SortKey(f.name,
            so.direction() == SortDirection.DESCENDING,
            so.nullOrdering() == NullOrdering.NULLS_FIRST)
      }
    }
    if (keys.nonEmpty && keys.forall(_.isDefined)) {
      topNPushed = Some((keys.flatten, limit))
      true
    } else false
  }

  /** Both the plain limit and the top-N are per-file partials. */
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan =
    new JsonLinesScan(fullSchema, required, pushed, path, aggPushed,
      limitPushed, topNPushed)
}

final class JsonLinesScan(fullSchema: StructType, required: StructType,
                          pushed: Array[Filter], path: String,
                          agg: Option[(Seq[String], Seq[AggSpec])] = None,
                          limit: Option[Int] = None,
                          topN: Option[(Seq[SortKey], Int)] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  /** Join-driven runtime row filtering (the DSv2 face of dynamic
    * partition pruning): when this scan probes a broadcast join,
    * Spark evaluates the build side first and hands the scan the
    * observed join-key values as IN/=-shaped predicates — rows that
    * cannot join are dropped at the line reader, before row
    * construction, exactly like the statically pushed filters (and
    * like them they are re-applied by Spark above, so a predicate we
    * fail to translate costs nothing but the skipped pruning). Only
    * the plain row-reader path can receive these: the DPP planner
    * rule matches nothing but Project/Filter between join and scan,
    * so a pushed aggregate or top-N (whose semantics pre-join row
    * drops WOULD change) structurally cannot co-occur. */
  @volatile private var runtimeFilters: Array[Filter] = Array.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    fullSchema.fieldNames.map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    runtimeFilters = predicates.flatMap(RuntimePredicate.toSourceFilter)

  /** When an aggregate is pushed, the scan's output IS the per-file
    * partial aggregation rows: group columns then agg columns, by
    * position (Spark's pushdown rewrite zips them positionally). */
  private def aggName(a: AggSpec): String = a match {
    case CountStarSpec => "count(*)"
    case CountColSpec(c) => s"count($c)"
    case MinSpec(c, _) => s"min($c)"
    case MaxSpec(c, _) => s"max($c)"
  }

  override def readSchema(): StructType = agg match {
    case None => required
    case Some((groups, funcs)) =>
      StructType(
        groups.map(g => fullSchema.fields.find(_.name == g).get) ++
          funcs.map(f => StructField(aggName(f), f.resultType)))
  }

  override def toBatch: Batch = this
  override def description(): String = {
    val aggDesc = agg.map { case (groups, funcs) =>
      s", PushedAggregates: [${funcs.map(aggName).mkString(", ")}]" +
        s", PushedGroupBy: [${groups.mkString(", ")}]"
    }.getOrElse("")
    val limitDesc = limit.map(n => s", PushedLimit: $n").getOrElse("")
    val topNDesc = topN.map { case (keys, n) =>
      val ks = keys.map(k => s"${k.col} " +
        (if (k.descending) "DESC" else "ASC") + " " +
        (if (k.nullsFirst) "NULLS FIRST" else "NULLS LAST")).mkString(", ")
      s", PushedTopN: ORDER BY [$ks] LIMIT $n"
    }.getOrElse("")
    s"graft-jsonl PushedFilters: [${pushed.mkString(", ")}]$aggDesc" +
      s"$limitDesc$topNDesc, ReadSchema: ${readSchema().catalogString}"
  }

  /** Runtime filters travel INSIDE the partitions, not the reader
    * factory: Spark 4 forces `createReaderFactory()` at planning time
    * (BatchScanExec.readerFactory is a lazy val touched by
    * `supportsColumnar` before the DPP subquery runs), while after
    * `filter()` it re-invokes only `planInputPartitions()` (inside
    * `filteredPartitions`). Capturing `runtimeFilters` in the factory
    * would therefore always see the empty pre-DPP array; embedding
    * them per-partition rides the one hook that IS re-evaluated.
    * Only the plain row reader receives them — a pushed aggregate or
    * top-N partial would change meaning under pre-join row drops (and
    * the DPP planner rule never offers filters to those shapes). */
  override def planInputPartitions(): Array[InputPartition] = {
    val rf = if (agg.isEmpty && topN.isEmpty) runtimeFilters
             else Array.empty[Filter]
    JsonLinesScan.listFiles(path)
      .map(JsonLinesPartition(_, rf): InputPartition)
  }

  /** Reader-level observability: rows actually emitted by the line
    * readers, so reader-side pruning (static pushdown + runtime
    * filters) is measurable from the executed plan's SQL metrics —
    * at 100 TB the difference between "filter applied at the line
    * reader" and "filter re-applied above the scan" is the scan's
    * entire output volume, and this metric is the proof. */
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new RowsEmittedMetric)

  override def createReaderFactory(): PartitionReaderFactory = (agg, topN) match {
    case (Some((groups, funcs)), _) =>
      new JsonLinesAggReaderFactory(fullSchema, pushed, groups, funcs)
    case (None, Some((keys, n))) =>
      new JsonLinesTopNReaderFactory(fullSchema, required, pushed, keys, n)
    case (None, None) =>
      new JsonLinesReaderFactory(fullSchema, required, pushed, limit)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new JsonLinesMicroBatchStream(fullSchema, required, pushed, path)
}

object JsonLinesScan {
  /** Stable file listing: a directory's visible data files sorted by
    * absolute path (crawl batch files are append-only and
    * lexically increasing, so the order is the arrival order). A path
    * that does not exist yet lists as EMPTY, not as a single file:
    * the streaming read polls this every trigger, and the normal
    * crawl startup order creates the consumer before the producer's
    * first batch directory. `listFiles()` may also return null on a
    * racing IO/permission error — same empty-listing treatment, the
    * next trigger retries. */
  def listFiles(path: String): Array[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(x => x.isFile && !x.getName.startsWith(".")
          && !x.getName.startsWith("_")).map(_.getAbsolutePath).sorted
    else if (f.isFile) Array(path)
    else Array.empty
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

/** `runtime` carries the join-driven DPP filters for THIS planning of
  * the scan (see [[JsonLinesScan.planInputPartitions]]) — the batch
  * path may embed them; the micro-batch path never does. */
final case class JsonLinesPartition(file: String,
                                    runtime: Array[Filter] = Array.empty)
    extends InputPartition

/** Sum-over-tasks metric for rows the line readers emit. */
final class RowsEmittedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = RowsEmittedMetric.NAME
  override def description(): String = "rows emitted by jsonl readers"
}
object RowsEmittedMetric { val NAME = "graftRowsEmitted" }

private[v2] final case class RowsEmittedTaskMetric(value: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = RowsEmittedMetric.NAME
}

final class JsonLinesReaderFactory(fullSchema: StructType, required: StructType,
                                   pushed: Array[Filter],
                                   limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[JsonLinesPartition]
    new JsonLinesReader(p.file, fullSchema, required,
      pushed ++ p.runtime, limit)
  }
}

/** Shared line parsing for the row and aggregate readers. */
private[v2] object LineParse {
  /** Parse one JSON line into (field → typed value) per the declared
    * schema; unparseable / missing / mistyped fields → null
    * (PERMISSIVE-mode semantics, the F5 policy). */
  def parse(mapper: ObjectMapper, fullSchema: StructType,
            line: String): Map[String, Any] =
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

  /** JVM value → Catalyst internal value (strings become UTF8String). */
  def toInternal(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }
}

final class JsonLinesReader(file: String, fullSchema: StructType,
                            required: StructType, pushed: Array[Filter],
                            limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val lines = scala.io.Source.fromFile(file, "UTF-8")
  private val it = lines.getLines()
  private var current: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    // pushed per-file LIMIT: stop consuming the file once this
    // partition has produced its n matching rows (Spark's retained
    // global limit finishes the job)
    if (limit.exists(emitted >= _)) return false
    while (it.hasNext) {
      val line = it.next().trim
      if (line.nonEmpty) {
        val parsed = LineParse.parse(mapper, fullSchema, line)
        if (pushed.forall(FilterEval.eval(_, parsed))) {
          current = project(parsed)
          emitted += 1
          return true
        }
      }
    }
    false
  }

  private def project(row: Map[String, Any]): InternalRow =
    new GenericInternalRow(
      required.fields.map(f => LineParse.toInternal(row(f.name)))
        .asInstanceOf[Array[Any]])

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(RowsEmittedTaskMetric(emitted))
}

final class JsonLinesTopNReaderFactory(fullSchema: StructType,
                                       required: StructType,
                                       pushed: Array[Filter],
                                       keys: Seq[SortKey], n: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonLinesTopNReader(partition.asInstanceOf[JsonLinesPartition].file,
      fullSchema, required, pushed, keys, n)
}

/** Per-file top-N under the pushed ORDER BY keys: one pass over the
  * file's matching lines through an n-bounded max-heap (the heap's
  * max is the WORST retained row — a new row replaces it when it
  * orders strictly lower), so memory is O(n) however large the file.
  * Emission order is arbitrary: the push is declared partial and
  * Spark's global TakeOrdered re-sorts the per-file candidates. */
final class JsonLinesTopNReader(file: String, fullSchema: StructType,
                                required: StructType, pushed: Array[Filter],
                                keys: Seq[SortKey], n: Int)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val mapper = new ObjectMapper()
    val lines = scala.io.Source.fromFile(file, "UTF-8")
    try {
      val ord = RowOrder.keyOrdering(keys)
      // PriorityQueue dequeues the Ordering's MAX — exactly the row
      // to evict when a better (lower-ordered) candidate arrives
      val heap = scala.collection.mutable.PriorityQueue.empty[Map[String, Any]](ord)
      lines.getLines().foreach { raw =>
        val line = raw.trim
        if (line.nonEmpty) {
          val parsed = LineParse.parse(mapper, fullSchema, line)
          if (pushed.forall(FilterEval.eval(_, parsed))) {
            if (heap.size < n) heap.enqueue(parsed)
            else if (ord.compare(parsed, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(parsed)
            }
          }
        }
      }
      heap.iterator.map(row => new GenericInternalRow(
        required.fields.map(f => LineParse.toInternal(row(f.name)))
          .asInstanceOf[Array[Any]]): InternalRow).toArray.iterator
    } finally lines.close()
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

final class JsonLinesAggReaderFactory(fullSchema: StructType,
                                      pushed: Array[Filter],
                                      groups: Seq[String], funcs: Seq[AggSpec])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonLinesAggReader(partition.asInstanceOf[JsonLinesPartition].file,
      fullSchema, pushed, groups, funcs)
}

/** Per-file partial aggregation: one pass over the file's matching
  * lines, one in-memory state per group (a crawl batch file's group
  * cardinality is bounded by its row count, itself bounded by the
  * producer's batch size). Emits group values then agg partials, by
  * position; Spark's final merge completes the distributed agg. A
  * file with no rows still emits its zero-count row for the global
  * (no-group) shape — SQL count over empty input is 0, not absent. */
final class JsonLinesAggReader(file: String, fullSchema: StructType,
                               pushed: Array[Filter],
                               groups: Seq[String], funcs: Seq[AggSpec])
    extends PartitionReader[InternalRow] {

  private def cmpVals(a: Any, b: Any): Int = RowOrder.cmpVals(a, b)

  private val rows: Iterator[InternalRow] = {
    val mapper = new ObjectMapper()
    val lines = scala.io.Source.fromFile(file, "UTF-8")
    try {
      val states = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Array[Any]]
      def stateOf(key: Seq[Any]): Array[Any] =
        states.getOrElseUpdate(key, Array.fill[Any](funcs.length)(null))
      if (groups.isEmpty) stateOf(Nil) // global agg: emit even if empty
      lines.getLines().foreach { raw =>
        val line = raw.trim
        if (line.nonEmpty) {
          val parsed = LineParse.parse(mapper, fullSchema, line)
          if (pushed.forall(FilterEval.eval(_, parsed))) {
            val st = stateOf(groups.map(parsed))
            funcs.zipWithIndex.foreach { case (f, i) =>
              f match {
                case CountStarSpec =>
                  st(i) = st(i) match { case null => 1L; case n: Long => n + 1L }
                case CountColSpec(c) =>
                  val inc = if (parsed(c) == null) 0L else 1L
                  st(i) = st(i) match { case null => inc; case n: Long => n + inc }
                case MinSpec(c, _) => (parsed(c), st(i)) match {
                  case (null, _) => ()
                  case (v, null) => st(i) = v
                  case (v, cur) => if (cmpVals(v, cur) < 0) st(i) = v
                }
                case MaxSpec(c, _) => (parsed(c), st(i)) match {
                  case (null, _) => ()
                  case (v, null) => st(i) = v
                  case (v, cur) => if (cmpVals(v, cur) > 0) st(i) = v
                }
              }
            }
          }
        }
      }
      states.iterator.map { case (key, st) =>
        val aggVals = funcs.zip(st).map {
          // empty-group count partial is 0, never null
          case (CountStarSpec | _: CountColSpec, null) => 0L
          case (_, v) => v
        }
        new GenericInternalRow(
          (key.map(LineParse.toInternal) ++ aggVals.map(LineParse.toInternal))
            .toArray[Any]): InternalRow
      }.toVector.iterator
    } finally lines.close()
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    if (!rows.hasNext) return false
    current = rows.next()
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Translation of the V2 `Predicate`s Spark hands to
  * SupportsRuntimeV2Filtering into the source's `Filter` algebra.
  * Runtime filters arrive as IN (broadcast join-key value sets) or
  * `=`; anything else is dropped — Spark re-applies every predicate
  * above the scan, so an untranslated shape only skips the pruning. */
private[v2] object RuntimePredicate {
  import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  def toSourceFilter(p: Predicate): Option[Filter] = p.name() match {
    case "IN" => p.children() match {
      case arr if arr.length >= 2 => (fieldOf(arr.head), litsOf(arr.tail)) match {
        case (Some(col), Some(vs)) => Some(In(col, vs))
        case _ => None
      }
      case _ => None
    }
    case "=" => p.children() match {
      case Array(f, l) => (fieldOf(f), litsOf(Array(l))) match {
        case (Some(col), Some(Array(v))) => Some(EqualTo(col, v))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames.head)
      case _ => None
    }

  private def litsOf(es: Array[org.apache.spark.sql.connector.expressions.Expression]): Option[Array[Any]] = {
    val vs = es.map {
      case l: Literal[_] => l.value match {
        // Catalyst internal string → the JVM string LineParse rows hold
        case s: UTF8String => s.toString
        case other => other
      }
      case _ => null
    }
    if (vs.contains(null)) None else Some(vs)
  }
}

/** Client-side evaluation of the pushed filter subset. */
object FilterEval {
  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNotNull | _: IsNull |
         _: In => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  def eval(f: Filter, row: Map[String, Any]): Boolean = f match {
    // null list values skipped explicitly: SQL `x IN (null)` is never
    // TRUE, and cmp's null/mismatch handling must not resurrect it
    case In(a, vs)                => vs.exists(v => v != null && cmp(row.get(a).flatMap(Option(_)), v).contains(0))
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
    * comparisons against null are not satisfied) AND on any
    * null/type-mismatched filter value: an unknown shape must decline
    * (row kept only by Spark's re-applied copy), never silently
    * match — the agg/top-N readers' partials cannot be repaired if a
    * wrong pre-aggregation row drop sneaks in. */
  private def cmp(rowVal: Option[Any], filterVal: Any): Option[Int] =
    rowVal.flatMap { x =>
      (x, filterVal) match {
        case (x: Long, v: Number)     => Some(java.lang.Long.compare(x, v.longValue()))
        case (x: Int, v: Number)      => Some(java.lang.Integer.compare(x, v.intValue()))
        case (x: Double, v: Number)   => Some(java.lang.Double.compare(x, v.doubleValue()))
        case (x: Boolean, v: Boolean) => Some(java.lang.Boolean.compare(x, v))
        case (x: String, v: String)   => Some(x.compareTo(v))
        case _                        => None
      }
    }
}
