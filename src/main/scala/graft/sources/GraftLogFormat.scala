package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.sinks.{TableLog, TableStats}

/** The FORMAT FACE of [[graft.sinks.TableLog]] — `graftlog` as a
  * Spark data source, so every table verb is reachable from the
  * format/SQL surface instead of library calls only (the r13 verdict's
  * "tables are paths + library calls" gap):
  *
  * {{{
  * spark.read.format("graftlog").option("versionAsOf", 2).load(dir)
  * df.write.format("graftlog").mode("append").save(dir)
  * sql("CREATE TEMPORARY VIEW t USING graftlog OPTIONS (path '…')")
  * }}}
  *
  * (`SELECT … FROM graftlog.`path`` direct-on-file SQL is a
  * FileFormat-only surface in Spark — probed, rejected with
  * UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY; the USING view above is
  * the pure-SQL face.)
  *
  * Architecture — the Delta connector's own route, not a hand-rolled
  * reader: `createRelation` resolves the pinned manifest and returns a
  * [[HadoopFsRelation]] over a custom [[FileIndex]] whose file listing
  * IS the manifest (plus Spark's stock [[ParquetFileFormat]]), so the
  * scan path is the engine's own vectorized parquet reader with
  * predicate pushdown, column pruning and whole-stage codegen
  * unchanged. MANIFEST-STATS SKIPPING engages through the standard
  * planner seam: `FileSourceStrategy` hands the pushed data filters to
  * `FileIndex.listFiles`, where each file's committed footer stats run
  * through [[TableStats.mayContain]] — files that provably cannot
  * match never enter the scan (the `readWhere` prune, now under plain
  * `df.filter`/SQL WHERE with zero caller cooperation). Pruning here
  * is never load-bearing: the scan re-applies the full filter to the
  * survivors, exactly like `readWhere`.
  *
  * Options: `path` (required), `versionAsOf` (time travel; default
  * head). Writes map SaveMode onto the log's verbs: Append →
  * `TableLog.append` (option `evolve=true` widens the schema),
  * Overwrite → `TableLog.overwrite` (option `overwriteSchema=true`
  * replaces it), ErrorIfExists/Ignore honor existing versions. Reads
  * pin their version at relation build — the TableLog reader
  * contract. */
class GraftLogSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graftlog"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graftlog: option 'path' (the TableLog table directory) is required"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val table = tablePath(parameters)
    val version = parameters.get("versionAsOf").map(_.toLong)
    val m = TableLog.manifest(spark, table, version)
    require(m.files.nonEmpty,
      s"graftlog: version ${m.version} of $table is empty")
    // committed schema when present; legacy pre-schema tables fall
    // back to one footer read (the TableLog.read rule)
    val dataSchema = m.schema.getOrElse(
      spark.read.parquet(new Path(table, m.files.head).toString).schema)
    HadoopFsRelation(
      location = new GraftLogFileIndex(spark, table, m),
      partitionSchema = StructType(Nil),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val table = tablePath(parameters)
    val exists = TableLog.headVersion(spark, table) > 0L
    mode match {
      case SaveMode.Append =>
        TableLog.append(data, table,
          evolve = parameters.get("evolve").exists(_.toBoolean))
      case SaveMode.Overwrite =>
        TableLog.overwrite(data, table,
          overwriteSchema = parameters.get("overwriteSchema").exists(_.toBoolean))
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graftlog: $table already has committed versions (SaveMode." +
            s"ErrorIfExists) — use append/overwrite")
      case SaveMode.ErrorIfExists => TableLog.append(data, table)
      case SaveMode.Ignore if exists => // no-op by contract
      case SaveMode.Ignore => TableLog.append(data, table)
    }
    createRelation(sqlContext, parameters)
  }
}

/** The manifest AS a [[FileIndex]]: listing = the pinned version's
  * file set, `listFiles` = that set minus the files whose committed
  * stats prove no pushed data filter can match ([[TableStats
  * .mayContain]] per conjunct — conservative, any unknown shape keeps
  * the file). One `getFileStatus` per file at build time (driver-side
  * metadata, O(files) like the manifest itself). */
private[sources] class GraftLogFileIndex(
    spark: SparkSession, table: String, m: TableLog.Manifest)
    extends FileIndex {

  private val fsys = new Path(table)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (relative path in the manifest, resolved status). Clone
    * manifests hold absolute paths — Path(table, rel) resolves both. */
  private val files: Seq[(String, FileStatus)] = m.files.map { rel =>
    rel -> fsys.getFileStatus(new Path(table, rel))
  }

  override def rootPaths: Seq[Path] =
    Seq(fsys.makeQualified(new Path(table)))

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = files.collect {
      case (rel, st) if m.stats.get(rel).forall(s =>
        dataFilters.forall(TableStats.mayContain(s, _))) => st
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  override def inputFiles: Array[String] =
    files.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = () // pinned at build — the reader contract

  override def sizeInBytes: Long = files.map(_._2.getLen).sum

  override def partitionSchema: StructType = StructType(Nil)
}
