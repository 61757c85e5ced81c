package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.TableLog

/** Manifest FILE-COUNT CEILING probe (round 15, verdict item #7) —
  * NOT part of the driver contract; run ad hoc:
  *
  *   sbt "runMain graft.ProbeManifestScale 10000"
  *
  * Builds a real TableLog table whose head holds N range-clustered
  * parquet files (one commit — repartitionByRange(N) of 10·N rows),
  * then times every driver-side metadata verb the log's scale story
  * leans on: the commit itself (data write + pooled footer harvest +
  * manifest publish), head resolution, full-manifest parse, a
  * selective readWhere prune over N per-file stats, statsSummary,
  * history, a small append on top (the O(Δ) claim), and the
  * checkpoint-due commit (the amortized O(files)/CHECKPOINT_EVERY
  * cost). Emits one JSON line; the decision lands in SCALING.md.
  */
object ProbeManifestScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe-manifest")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val table = java.nio.file.Files.createTempDirectory(s"graft-mprobe-$n").toString
    def ms[A](body: => A): (A, Long) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1000000L)
    }
    val rows = spark.range(10L * n)
      .select(col("id"), (col("id") % 97).as("x"),
        concat(lit("doc-"), col("id")).as("s"))
      .repartitionByRange(n, col("id"))
    val (_, tCommit) = ms(TableLog.append(rows, table))
    val files = TableLog.manifest(spark, table).files.size
    val (_, tHead) = ms(TableLog.headVersion(spark, table))
    val (_, tResolve) = ms(TableLog.manifest(spark, table))
    // selective range prune: ~1/1000 of the id space
    val pred = col("id") >= lit(5L * n) && col("id") < lit(5L * n + 10L * n / 1000)
    val ((all, kept), tPrune) = ms(TableLog.pruneFiles(spark, table, pred))
    val (_, tScan) = ms(TableLog.readWhere(spark, table, pred).count())
    val (_, tSummary) = ms(TableLog.statsSummary(spark, table).count())
    val (_, tHistory) = ms(TableLog.history(spark, table))
    // the O(Δ) face: a 1-file append on top of the N-file head
    val one = spark.range(1).select((col("id") + 100L * n).as("id"),
      lit(0L).as("x"), lit("tail").as("s")).coalesce(1)
    val (_, tDelta) = ms(TableLog.append(one, table))
    // force the checkpoint-due commit (CHECKPOINT_EVERY = 8): pays the
    // full-snapshot write — the amortized O(files) cost per 8 commits
    (3 to TableLog.CHECKPOINT_EVERY).foreach(_ => TableLog.append(one, table))
    val (_, tCkptCommit) = ms(TableLog.append(one, table))
    val (_, tResolveTail) = ms(TableLog.manifest(spark, table))
    val manifestBytes = new java.io.File(table, "_log")
      .listFiles().map(_.length()).max
    println(s"""{"probe":"manifest_scale","n_files":$files,""" +
      s""""commit_ms":$tCommit,"head_ms":$tHead,"resolve_ms":$tResolve,""" +
      s""""prune_ms":$tPrune,"pruned_to":${kept.size},"of":${all.size},""" +
      s""""scan_ms":$tScan,"summary_ms":$tSummary,"history_ms":$tHistory,""" +
      s""""delta_append_ms":$tDelta,"ckpt_commit_ms":$tCkptCommit,""" +
      s""""resolve_with_tail_ms":$tResolveTail,""" +
      s""""max_manifest_bytes":$manifestBytes}""")
    ProbeUtil.rmTree(table) // leave nothing behind
    spark.stop()
  }
}
