package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off SCALING.md probe harness — the isolated-JVM measurements
  * the bench's gate suite can't express (phase-separated walls,
  * byte accounting). Each mode prints ONE JSON line; rows land in
  * SCALING.md / SCALE100_r{N}.json with the protocol noted there.
  *
  * Modes:
  *  - `widedelete <sfDir> <workDir>` — the worst copy-on-write case
  *    the r13 verdict asked priced (item 6): a table committed as
  *    FEW WIDE files (4 range appends of the full documents frame,
  *    text column included), then (a) a one-hot-row-PER-FILE delete
  *    (every file rewrites for a 1-row logical change — the case
  *    merge-on-read deletion vectors exist for) and (b) a same-size
  *    delete confined to ONE file (the stats-prune best case), each
  *    timed separately with bytes-rewritten accounting from the
  *    manifests.
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0) match {
      case "widedelete" => wideDelete(spark, args(1), args(2))
      case other => sys.error(s"unknown probe mode $other")
    }
    spark.stop()
  }

  private def wideDelete(spark: SparkSession, sfDir: String, work: String): Unit = {
    import graft.sinks.TableLog
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (mn, mx, n) = {
      val r = docs.agg(min("doc_id"), max("doc_id"), count(lit(1))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val span = (mx - mn) / 4 + 1
    val t = new java.io.File(work, "widedelete-table").toString
    // 4 range appends, each coalesced to ONE wide file (text included)
    (0 until 4).foreach { i =>
      TableLog.append(docs.filter(col("doc_id") >= mn + i * span &&
        col("doc_id") < mn + (i + 1) * span).coalesce(1), t)
    }
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytesOf(files: Seq[String]): Long = files.map(rel =>
      f.getFileStatus(new org.apache.hadoop.fs.Path(t, rel)).getLen).sum
    val m0 = TableLog.manifest(spark, t)
    val tableBytes = bytesOf(m0.files)
    // one hot row per file — REAL ids (the corpus ids are sparse:
    // rep-offset blocks), one inside each file's stats interval
    val hotIds = (0 until 4).map(i =>
      docs.filter(col("doc_id") >= mn + i * span)
        .agg(min("doc_id")).head.getLong(0))
    val t1 = System.nanoTime()
    TableLog.delete(spark, t, col("doc_id").isin(hotIds: _*))
    val secAll = (System.nanoTime() - t1) / 1e9
    val m1 = TableLog.manifest(spark, t)
    val rewrittenAll = bytesOf(m1.files.filterNot(m0.files.toSet))
    val touchedAll = m0.files.count(x => !m1.files.contains(x))
    // the contrast: same cardinality, confined to ONE file's range
    val oneIds = (1 until 5).map(k => mn + k) // 4 ids, all in range 0
    val t2 = System.nanoTime()
    TableLog.delete(spark, t, col("doc_id").isin(oneIds: _*))
    val secOne = (System.nanoTime() - t2) / 1e9
    val m2 = TableLog.manifest(spark, t)
    val rewrittenOne = bytesOf(m2.files.filterNot(m1.files.toSet))
    val touchedOne = m1.files.count(x => !m2.files.contains(x))
    println(
      s"""{"probe":"widedelete","rows":$n,"files":4,"table_mb":${tableBytes >> 20},""" +
      s""""hot_per_file":{"sec":${f"$secAll%.2f"},"files_rewritten":$touchedAll,"mb_rewritten":${rewrittenAll >> 20}},""" +
      s""""one_file":{"sec":${f"$secOne%.2f"},"files_rewritten":$touchedOne,"mb_rewritten":${rewrittenOne >> 20}}}""")
  }
}
