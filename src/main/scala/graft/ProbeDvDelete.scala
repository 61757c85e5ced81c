package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.TableLog

/** Scattered-erasure ECONOMICS probe — the round-14 widedelete probe
  * re-run against merge-on-read deletion vectors (round-15 verdict
  * item #1's "measured" leg). NOT part of the driver contract:
  *
  *   sbt "runMain graft.ProbeDvDelete /root/testdata/sf0.1 10"
  *
  * Builds the r14 worst case twice — a REPS× documents corpus in 4
  * wide files, ONE hot row per file to erase (chosen per actual file
  * membership via _metadata) — and deletes it through (a) the
  * copy-on-write verb and (b) deleteVectors, reporting wall + bytes
  * written + files rewritten for each, plus the DV-applied read's
  * cost vs the materialized read. One JSON line; the decision row
  * lands in SCALING.md / SCALE100_r15.json.
  */
object ProbeDvDelete {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe-dvdelete")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms[A](body: => A): (A, Long) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1000000L)
    }
    val base = graft.sources.Tables.documents(spark, src)
    val docs = (0 until reps).map(r => base.withColumn("doc_id",
        col("doc_id") + lit(r.toLong * 10_000_000L)))
      .reduce(_ unionByName _)
      .repartition(4)
      .localCheckpoint(true)
    def build(tag: String): String = {
      val t = java.nio.file.Files.createTempDirectory(s"graft-dvprobe-$tag").toString
      TableLog.append(docs, t)
      t
    }
    def dirBytes(t: String, rels: Seq[String]): Long = {
      val f = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
      rels.map(rel => f.getFileStatus(new Path(t, rel)).getLen).sum
    }
    val cowT = build("cow")
    val dvT = build("dv")
    // one hot row per file, chosen from REAL file membership
    val hot = spark.read.parquet(
        TableLog.manifest(spark, cowT).files.map(r => s"$cowT/$r"): _*)
      .groupBy(col("_metadata.file_name"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val pred = col("doc_id").isin(hot: _*)
    val preCow = TableLog.manifest(spark, cowT)
    val tableBytes = dirBytes(cowT, preCow.files)
    val (_, tCow) = ms(TableLog.delete(spark, cowT, pred))
    val postCow = TableLog.manifest(spark, cowT)
    val cowNew = postCow.files.filterNot(preCow.files.toSet)
    val cowBytes = dirBytes(cowT, cowNew)
    val preDv = TableLog.manifest(spark, dvT)
    val (_, tDv) = ms(TableLog.deleteVectors(spark, dvT, pred))
    val postDv = TableLog.manifest(spark, dvT)
    val dvNew = postDv.files.filterNot(preDv.files.toSet) ++
      postDv.dvs.valuesIterator.map(_.path).toSeq.distinct
    val dvBytes = dirBytes(dvT, dvNew)
    val carried = postDv.files.toSet == preDv.files.toSet
    // read costs: DV-applied vs materialized
    val (nDv, tReadDv) = ms(TableLog.read(spark, dvT).count())
    val (nCow, tReadCow) = ms(TableLog.read(spark, cowT).count())
    val (_, tCompact) = ms(TableLog.compact(spark, dvT, numFiles = 4))
    val (_, tReadMat) = ms(TableLog.read(spark, dvT).count())
    require(nDv == nCow, s"parity: $nDv vs $nCow")
    println(s"""{"probe":"dv_delete","reps":$reps,"rows":${docs.count()},""" +
      s""""table_bytes":$tableBytes,"hot_rows":${hot.size},""" +
      s""""cow_ms":$tCow,"cow_bytes":$cowBytes,"cow_files_rewritten":${cowNew.size},""" +
      s""""dv_ms":$tDv,"dv_bytes":$dvBytes,"dv_carried_all":$carried,""" +
      s""""read_dv_ms":$tReadDv,"read_cow_ms":$tReadCow,""" +
      s""""compact_ms":$tCompact,"read_materialized_ms":$tReadMat}""")
    Seq(cowT, dvT).foreach(ProbeUtil.rmTree) // leave nothing behind
    spark.stop()
  }
}
