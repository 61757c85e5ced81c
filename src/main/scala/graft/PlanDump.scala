package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `explain formatted` for named declared queries to
  * plans/<dir>/<query>_<tag>.txt — the optimization-round evidence
  * files (judge-checkable plan claims). NOT driver surface.
  *
  * Usage: sbt "runMain graft.PlanDump <dir> <tag> <q1,q2,...>"
  * e.g.   sbt "runMain graft.PlanDump r17 before q166_entity_resolution"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <dir> <tag> <q1,q2,...>")
    val Array(dir, tag, names) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = Paths.get(s"plans/$dir")
    Files.createDirectories(out)
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(out.resolve(s"${name}_$tag.txt"), plan.getBytes("UTF-8"))
      println(s"wrote plans/$dir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
