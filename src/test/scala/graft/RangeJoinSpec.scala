package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin
import graft.sources.Tables

/** RangeJoin.binned: row-identical to the naive inequality join, with
  * inclusive boundaries and no loss across bin edges. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned equals naive inequality join on events (multi-bin intervals)") {
    val ev = Tables.events(spark, sf("sf0.001")).select($"event_id", $"ts")
    val iv = Tables.events(spark, sf("sf0.001"))
      .groupBy($"user_id".as("owner")).agg(min($"ts").as("lo"))
      .withColumn("hi", $"lo" + expr("INTERVAL 1 HOUR"))
    // bin (10 min) much smaller than interval (1 h): each interval
    // spans ~7 bins, exercising the explode path
    val got = RangeJoin.binned(ev, "ts", iv, "lo", "hi", 600)
      .select($"event_id", $"owner")
    val want = ev.join(iv, $"ts" >= $"lo" && $"ts" <= $"hi")
      .select($"event_id", $"owner")
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("boundaries inclusive; matches at bin edges survive") {
    def t(s: String) = Timestamp.valueOf(s)
    val points = Seq((1L, t("2024-01-01 00:00:00")), (2L, t("2024-01-01 01:00:00")),
      (3L, t("2024-01-01 00:59:59")), (4L, t("2024-01-01 01:00:01")))
      .toDF("id", "ts")
    val intervals = Seq((10L, t("2024-01-01 00:00:00"), t("2024-01-01 01:00:00")))
      .toDF("iid", "lo", "hi")
    // 1-second bins: lo and hi land exactly on bin edges
    val got = RangeJoin.binned(points, "ts", intervals, "lo", "hi", 1)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L)) // 4 is past hi (exclusive beyond)
  }
}
