package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Enrich
import graft.sinks.HttpSink
import graft.sources.{HttpConnector, PagedSource}

/** The live half of the connector layer, exercised over REAL sockets:
  * an in-process localhost HttpServer (JDK built-in) plays the remote
  * API, so every byte crosses an actual HTTP connection — UTF-8
  * bodies, status codes, timeouts — with zero network egress. This is
  * the integration test the injectable-fake specs (SourcesSpec,
  * PipelineSpec) deliberately don't do.
  */
class LiveHttpSpec extends SparkSpec {

  private var server: HttpServer = _
  private var base: String = _
  // (epochMillis, q) per /geo/search call — ordering is the rate-limit probe
  private val searchCalls = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
  private val ingested = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    val out = ex.getResponseBody
    try out.write(bytes) finally out.close()
  }

  private def param(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getRawQuery).toSeq
      .flatMap(_.split("&").toSeq)
      .collectFirst { case kv if kv.startsWith(name + "=") =>
        java.net.URLDecoder.decode(kv.drop(name.length + 1), "UTF-8") }

  private def handler(f: HttpExchange => Unit): HttpHandler = new HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try f(ex) catch { case _: Exception => respond(ex, 500, """{"err":"handler"}""") }
      finally ex.close()
  }

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())

    // Paged listing: 2 records per page; page 3 fails iff fail3=1.
    server.createContext("/pages", handler { ex =>
      val page = param(ex, "page").getOrElse("0")
      if (page == "3" && param(ex, "fail3").contains("1"))
        respond(ex, 500, """{"err":"page exploded"}""")
      else
        respond(ex, 200,
          s"""[{"page":$page,"name":"식당-$page-갑"},{"page":$page,"name":"식당-$page-을"}]""")
    })

    // Rendered-HTML listing: fixture pages in the reference's DOM row
    // shape (li.UEzoS / span.TYaxT / span.KCMnt / a.place_bluelink).
    server.createContext("/rest", handler { ex =>
      val page = param(ex, "page").getOrElse("0")
      val res = getClass.getResourceAsStream(s"/fixtures/restaurants_page$page.html")
      if (res == null) respond(ex, 404, """{"err":"no such page"}""")
      else {
        val body = try scala.io.Source.fromInputStream(res, "UTF-8").mkString
          finally res.close()
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
        ex.sendResponseHeaders(200, bytes.length)
        val out = ex.getResponseBody
        try out.write(bytes) finally out.close()
      }
    })

    // Nominatim shape: lat/lon as STRINGS, top-1 array; unknown → [].
    server.createContext("/geo/search", handler { ex =>
      val q = param(ex, "q").getOrElse("")
      searchCalls.add((System.currentTimeMillis(), q))
      val known = Map(
        "서울 강남구"  -> (("37.4979", "127.0276")),
        "서울 마포구"  -> (("37.5637", "126.9084")),
        "부산 해운대구" -> (("35.1631", "129.1635")))
      known.get(q) match {
        case Some((lat, lon)) =>
          respond(ex, 200, s"""[{"lat":"$lat","lon":"$lon","display_name":"$q"}]""")
        case None => respond(ex, 200, "[]")
      }
    })

    // POST sinks: /ingest records bodies; /ingest-fail always 500s.
    server.createContext("/ingest", handler { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      ingested.add(body)
      respond(ex, 200, """{"ok":true}""")
    })
    server.createContext("/ingest-fail", handler { ex =>
      ex.getRequestBody.readAllBytes()
      respond(ex, 500, """{"ok":false}""")
    })

    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override protected def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private val pageSchema = StructType(Seq(
    StructField("page", LongType), StructField("name", StringType)))

  test("pagedJsonFetcher: 4 HTTP pages fan into typed rows, one task per page") {
    import spark.implicits._
    val raw = PagedSource.fetch(spark, 4, HttpConnector.pagedJsonFetcher(s"$base/pages"))
    val rows = raw.toDF("raw")
      .select(from_json(col("raw"), pageSchema).as("r"))
      .select(col("r.page"), col("r.name"))
    val got = rows.as[(Long, String)].collect().sorted
    assert(got.length == 8)
    assert(got.map(_._1).distinct.toSeq == Seq(1L, 2L, 3L, 4L))
    // Korean survives the socket round-trip byte-exact
    assert(got.contains((2L, "식당-2-갑")))
  }

  test("pagedJsonFetcher: failed page skipped under tolerateFailures, fatal otherwise") {
    import spark.implicits._
    val url = s"$base/pages?fail3=1"
    val tolerant = PagedSource.fetch(
      spark, 4, HttpConnector.pagedJsonFetcher(url), tolerateFailures = true)
    assert(tolerant.count() == 6) // page 3's two records lost, job survives

    val strict = PagedSource.fetch(spark, 4, HttpConnector.pagedJsonFetcher(url))
    val e = intercept[org.apache.spark.SparkException] { strict.count() }
    assert(e.getMessage.contains("page 3") || e.getCause != null)
  }

  test("pagedHtmlFetcher: fixture DOM pages over a real socket fan into typed restaurant rows") {
    import spark.implicits._
    // the reference's extraction contract (restaurant-crawler.py:313,
    // :168-178): rows by li.UEzoS, name/category by span class, the
    // place id regexed out of the bluelink href
    val fields = Seq(
      graft.sources.HtmlExtract.Field("name", "span.TYaxT", default = "이름 없음"),
      graft.sources.HtmlExtract.Field("category", "span.KCMnt"),
      graft.sources.HtmlExtract.Field("place_id", "a.place_bluelink",
        attr = Some("href"), pattern = Some("/place/(\\d+)")))
    val raw = PagedSource.fetch(spark, 2,
      HttpConnector.pagedHtmlFetcher(s"$base/rest", "li.UEzoS", fields))
    val schema = StructType(Seq(StructField("name", StringType),
      StructField("category", StringType), StructField("place_id", StringType)))
    val rows = raw.toDF("raw")
      .select(from_json(col("raw"), schema).as("r"))
      .select(col("r.name"), col("r.category"), col("r.place_id"))
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(
      ("김밥천국 강남점", "분식", "1129849271"),
      ("평양냉면 & 만두", "", "37417907"),
      ("순대국밥", "한식", "20030042"),
      ("할머니 손칼국수", "국수", "555"),
      ("비밀의 정원", "카페", "")))
    // a missing page is a fetch failure, not silent emptiness
    val bad = PagedSource.fetch(spark, 3,
      HttpConnector.pagedHtmlFetcher(s"$base/rest", "li.UEzoS", fields))
    intercept[org.apache.spark.SparkException] { bad.count() }
  }

  test("nominatimClient via rateLimited: parsed coordinates, per-row misses, spaced calls") {
    import spark.implicits._
    searchCalls.clear()
    val geoBase = s"$base/geo" // local val: the task closure must not drag the spec (and its HttpServer) in
    val addrs = Seq("서울 강남구", "없는 동네", "부산 해운대구").toDS().coalesce(1)
    val out = Enrich.rateLimited[String, (Double, Double)](
        addrs, () => HttpConnector.nominatimClient(geoBase), minIntervalMs = 150L)
      .collect().toMap
    assert(out("서울 강남구") == Some((37.4979, 127.0276)))
    assert(out("부산 해운대구") == Some((35.1631, 129.1635)))
    assert(out("없는 동네").isEmpty) // HTTP 200 + empty hits → None, row survives
    // The limiter held between consecutive calls on the one partition.
    val times = searchCalls.toArray(Array.empty[(Long, String)]).map(_._1).sorted
    assert(times.length == 3)
    val gaps = times.sliding(2).map(w => w(1) - w(0)).toSeq
    assert(gaps.forall(_ >= 100L), s"calls not rate-limited: gaps=$gaps")
  }

  test("JdkHttpTransport: real POSTs land byte-exact; 500s become dead letters") {
    import spark.implicits._
    ingested.clear()
    val df = Seq(("r1", "김밥천국"), ("r2", "평양냉면"), ("r3", "순대국밥"))
      .toDF("id", "name")

    val ok = HttpSink.deliver(df, s"$base/ingest", "id", new HttpSink.JdkHttpTransport())
    assert(ok.collect().forall(_.status == "success"))
    val bodies = ingested.toArray(Array.empty[String]).sorted
    assert(bodies.length == 3)
    assert(bodies.exists(b => b.contains("평양냉면") && b.contains("\"id\":\"r2\"")))

    val dead = HttpSink.deliver(df, s"$base/ingest-fail", "id", new HttpSink.JdkHttpTransport())
    val rows = dead.collect()
    assert(rows.forall(d => d.status == "failed" && d.error == "HTTP 500"))
    val m = HttpSink.metrics(dead).collect()
    assert(m.length == 1 && m(0).getAs[Long]("n") == 3)
  }
}
