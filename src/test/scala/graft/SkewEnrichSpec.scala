package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, Enrich, Skew}
import graft.sources.Tables

object SkewEnrichSpecFixtures {
  val fakeGeocoder: () => String => Option[(Double, Double)] = () => {
    addr => if (addr.contains("마포")) Some((37.54, 126.95)) else None
  }
}

class SkewEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result identical to plain join on skewed data") {
    // skew: one hot key with 10k rows
    val big = spark.range(10000).select(lit("hot").as("k"), $"id".as("v"))
      .unionByName(spark.range(100).select(concat(lit("k"), $"id").as("k"), $"id".as("v")))
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = big.join(small, "k").select("k", "v", "label")
    val salted = Skew.saltedJoin(big, small, "k", factor = 8).select("k", "v", "label")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("rate-limited enrichment spaces calls and isolates failures") {
    import SkewEnrichSpecFixtures._
    val addrs = Seq("서울 마포구 마포대로 100", "unknown place", "서울 마포구 2").toDS().repartition(1)
    val t0 = System.currentTimeMillis()
    val out = Enrich.rateLimited(addrs, fakeGeocoder, minIntervalMs = 50).collect()
    val elapsed = System.currentTimeMillis() - t0
    assert(out.length == 3)
    assert(out.count(_._2.isDefined) == 2)      // failure isolated, not thrown
    assert(elapsed >= 100, s"elapsed=$elapsed") // >= 2 gaps of 50ms in one partition
  }

  test("as-of join matches a windowed reference computation") {
    val events = Tables.events(spark, sf("sf0.001")).select("event_id", "user_id", "ts")
    val ro = Tables.orders(spark, sf("sf0.001"))
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("last_orderkey"))
      .select($"o_custkey".as("k"), $"o_orderdate".as("t"), $"last_orderkey")
    val got = AsOfJoin.leftAsOf(events, ro, "user_id", "k", "ts", "t")
      .select($"event_id", $"_match.last_orderkey".as("lo"))
    // reference: per event, max order date <= ts via plain (small-data) join
    val ref = events.join(ro, $"user_id" === $"k" && $"ts" >= $"t", "left_outer")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"event_id").orderBy($"t".desc_nulls_last)))
      .filter($"rn" === 1)
      .select($"event_id", $"last_orderkey".as("lo"))
    assert(got.except(ref).count() == 0 && ref.except(got).count() == 0)
    assert(got.count() == events.count()) // left semantics: every event kept
  }
}
