package graft

import org.apache.spark.sql.functions._
import graft.sources.PagedSource
import graft.sinks.JdbcSink

/** Serializable fixtures: defined outside the suite so executor
  * closures don't capture the (non-serializable) test engine. */
object SourcesSpecFixtures {
  case class Page(page: Int, place_id: String, name: String)
  val goodFetcher: Int => Seq[Page] =
    p => (1 to 3).map(i => Page(p, s"$p-$i", s"r$p$i"))
  val crashyFetcher: Int => Seq[Page] =
    p => if (p == 3) throw new RuntimeException("page crash")
         else Seq(Page(p, s"$p", s"r$p"))
}

/** Sources/sinks added for the reference's ingestion surface. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._
  import SourcesSpecFixtures._

  test("S5 PagedSource: one task per page, executor-side fetch, union of pages") {
    val out = PagedSource.fetch[Page](spark, 4, goodFetcher)
    assert(out.count() == 12)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.filter($"page" === 2).count() == 3)
  }

  test("S5 PagedSource: failed page skipped when tolerated (hello.py:408-413 twin)") {
    val out = PagedSource.fetch[Page](spark, 4, crashyFetcher, tolerateFailures = true)
    assert(out.count() == 3)
    assert(out.filter($"page" === 3).count() == 0)
  }

  test("K2 JdbcSink.upsertBatch: composite-key anti-join + NOT-NULL defaults") {
    val incoming = Seq(
      ("공덕 맛집", "서울 마포구 마포대로 100", Some(37.5), Some(126.9), Some("t.jpg")),
      ("신규 식당", null, None, None, None),
      ("기존 식당", "서울 용산구 1", Some(1.0), Some(2.0), None)
    ).toDF("name", "address", "latitude", "longitude", "thumbnail")
    val existing = Seq(("기존 식당", "서울 용산구 1")).toDF("name", "address")
    val out = JdbcSink.upsertBatch(incoming, existing)
    assert(out.count() == 2)
    val newRow = out.filter($"name" === "신규 식당").collect().head
    assert(newRow.getAs[String]("address") == "")      // NOT-NULL default
    assert(newRow.getAs[Double]("latitude") == 0.0)
    assert(out.filter($"name" === "기존 식당").count() == 0)
  }

  test("S1 table paths are scheme-agnostic: a grafts3:// URI reads through the registered FileSystem") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.grafts3.impl", classOf[FakeObjectStoreFS].getName)
    conf.set("fs.grafts3.impl.disable.cache", "true")
    FakeObjectStoreFS.opens.set(0)
    val viaStore = graft.sources.Tables.nation(spark, "grafts3://" + sf("sf0.001"))
    val viaFile = graft.sources.Tables.nation(spark, sf("sf0.001"))
    assert(viaStore.count() == viaFile.count() && viaStore.count() > 0)
    assert(viaStore.exceptAll(viaFile).count() == 0 &&
      viaFile.exceptAll(viaStore).count() == 0)
    // and the bytes actually flowed through the grafts3 FileSystem —
    // scheme resolution did not silently fall back to file:
    assert(FakeObjectStoreFS.opens.get() > 0,
      "expected parquet reads through FakeObjectStoreFS")
  }

  test("A6/U4: dict-of-lists JSON normalizes to rows (explode map values)") {
    import org.apache.spark.sql.types._
    val json = """{"공덕역 식당": [{"placeId":"1","name":"a"},{"placeId":"2","name":"b"}],
                  |"용산 식당": [{"placeId":"3","name":"c"}]}""".stripMargin.replace("\n", "")
    val mapType = MapType(StringType,
      ArrayType(StructType(Seq(StructField("placeId", StringType), StructField("name", StringType)))))
    val out = Seq(json).toDF("v")
      .select(explode(from_json($"v", mapType)).as(Seq("search_query", "rows")))
      .select($"search_query", explode($"rows").as("r"))
      .select($"search_query", $"r.placeId", $"r.name")
    assert(out.count() == 3)
    assert(out.filter($"search_query" === "공덕역 식당").count() == 2)
  }
}
