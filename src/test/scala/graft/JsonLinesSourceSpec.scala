package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataSourceV2 jsonl source: correctness of reads, pushdown
  * visibility in the plan, and partition-per-file planning. */
class JsonLinesSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("place_id", StringType),
    StructField("name", StringType),
    StructField("page", LongType),
    StructField("latitude", DoubleType)))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(Paths.get(d, "p1.jsonl"),
      """{"place_id":"1","name":"공덕 맛집","page":1,"latitude":37.5}
        |{"place_id":"2","name":"b","page":1,"latitude":35.1}
        |not json at all
        |{"place_id":null,"name":"c","page":1}
        |""".stripMargin)
    Files.writeString(Paths.get(d, "p2.jsonl"),
      """{"place_id":"3","name":"d","page":2,"latitude":36.0}
        |{"place_id":"4","name":"e","page":2,"latitude":33.3,"extra":"ignored"}
        |""".stripMargin)
    d
  }

  private def read = spark.read
    .format("graft.sources.v2.JsonLinesSource").schema(schema).load(dir)

  test("reads all rows with PERMISSIVE nulls for bad lines/missing fields") {
    val rows = read.collect()
    assert(rows.length == 6) // 4 + 2, corrupt line -> all-null row
    assert(read.filter(col("place_id").isNull).count() == 2)
    assert(read.filter(col("name") === "공덕 맛집").count() == 1)
  }

  test("filter + projection are pushed into the scan") {
    val q = read.filter(col("page") === 2 && col("latitude") > 34.0)
      .select("place_id", "name")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("3"))
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("graft-jsonl PushedFilters: [") &&
           desc.contains("EqualTo(page,2)"), desc)
    assert(desc.contains("ReadSchema: struct<place_id:string,name:string"), desc)
  }

  test("one input partition per file") {
    assert(read.rdd.getNumPartitions == 2)
  }

  test("null comparisons follow SQL semantics (filter never matches null)") {
    assert(read.filter(col("latitude") > 0.0).count() == 4) // row c has null latitude
  }

  // ------------------------------------------------------ aggregate pushdown

  test("count/min/max push into the scan as per-file partials; Spark merges") {
    val q = read.groupBy(col("page"))
      .agg(count(lit(1)).as("n"), count(col("place_id")).as("n_ids"),
        min(col("latitude")).as("lo"), max(col("latitude")).as("hi"))
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("PushedAggregates: [count(*), count(place_id), min(latitude), max(latitude)]")
      && desc.contains("PushedGroupBy: [page]"), desc)
    val rows = q.collect().map(r => (Option(r.get(0)), r.getLong(1),
      r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toSet
    assert(rows == Set(
      (Some(1L), 3L, 2L, Some(35.1), Some(37.5)), // incl. null-place_id row
      (Some(2L), 2L, 2L, Some(33.3), Some(36.0)),
      (None, 1L, 0L, None, None)))                // the corrupt line's group
  }

  test("global aggregate (no group-by) pushes and counts empty groups as zero") {
    val q = read.agg(count(lit(1)).as("n"), min(col("page")).as("lo"))
    assert(q.queryExecution.executedPlan.toString.contains("PushedAggregates: [count(*), min(page)]"))
    val r = q.collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 1L)
  }

  test("pushed string min/max uses UTF-8 binary order, matching Spark's UTF8String") {
    // U+1F604 (surrogate pair, UTF-8 F0 9F 98 84) vs U+E000 (UTF-8
    // EE 80 80): UTF-16 code-unit order puts the emoji FIRST
    // (0xD83D < 0xE000) while Spark's UTF8String binary order puts it
    // LAST — a per-file partial computed in UTF-16 order silently
    // disagrees with the same query run without pushdown.
    val d = Files.createTempDirectory("graft-jsonl-utf8").toString
    val priv = "\uE000"
    val emoji = new String(Character.toChars(0x1F604))
    Files.writeString(Paths.get(d, "p1.jsonl"),
      s"""{"place_id":"1","name":"$priv","page":1}\n{"place_id":"2","name":"$emoji","page":1}\n""")
    val rd = spark.read.format("graft.sources.v2.JsonLinesSource")
      .schema(schema).load(d)
    val q = rd.agg(min(col("name")).as("lo"), max(col("name")).as("hi"))
    assert(q.queryExecution.executedPlan.toString
      .contains("PushedAggregates: [min(name), max(name)]"))
    val r = q.collect().head
    assert(r.getString(0) == priv && r.getString(1) == emoji,
      "min/max must match Spark's own UTF-8 binary string order")
  }

  test("aggregate does NOT push past a residual filter; result still correct") {
    val q = read.filter(col("latitude") > 34.0).groupBy(col("page"))
      .agg(count(lit(1)).as("n"))
    assert(!q.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "filters are reported residual, so an aggregate above one must not push")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 2L), (2L, 1L)))
  }

  test("unsupported aggregates (avg, distinct) fall back to a plain scan") {
    val q = read.groupBy(col("page")).agg(avg(col("latitude")).as("a"),
      countDistinct(col("place_id")).as("nd"))
    assert(!q.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(q.count() == 3)
  }

  // ------------------------------------------------------------ write path

  private def readFrom(d: String) = spark.read
    .format("graft.sources.v2.JsonLinesSource").schema(schema).load(d)

  private def sample = {
    import spark.implicits._
    Seq(("10", "써니 식당", 1L, 37.5), ("11", "x", 2L, 35.0))
      .toDF("place_id", "name", "page", "latitude")
  }

  test("write round-trips through the v2 sink (UTF-8, nulls)") {
    val out = Files.createTempDirectory("graft-jsonl-w").toString
    import spark.implicits._
    val df = sample.unionByName(
      Seq((null.asInstanceOf[String], "c", 3L, null.asInstanceOf[java.lang.Double]))
        .toDF("place_id", "name", "page", "latitude"))
    df.write.format("graft.sources.v2.JsonLinesSource")
      .mode("append").save(out)
    val back = readFrom(out)
    assert(back.count() == 3)
    assert(back.filter(col("name") === "써니 식당").count() == 1)
    assert(back.filter(col("place_id").isNull).count() == 1)
  }

  test("streaming write: epoch-named files, resumable, read-back matches") {
    val in = Files.createTempDirectory("graft-jsonl-sin").toString
    val out = Files.createTempDirectory("graft-jsonl-sout").toString
    val ck = Files.createTempDirectory("graft-jsonl-sck").toString
    sample.write.mode("overwrite").parquet(s"$in/b1")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(sample.schema).parquet(s"$in/b*")
        .writeStream.format("graft.sources.v2.JsonLinesSource")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(readFrom(out).count() == 2)
    // second batch arrives; resume from checkpoint → only new rows land
    sample.limit(1).write.mode("overwrite").parquet(s"$in/b2")
    runOnce()
    assert(readFrom(out).count() == 3)
    val files = new java.io.File(out).listFiles().map(_.getName).filter(_.endsWith(".jsonl"))
    assert(files.forall(_.matches("part-e\\d+-p\\d+\\.jsonl")), files.mkString(", "))
  }

  // ------------------------------------------------------- streaming read

  test("micro-batch read: restart resumes the offset log, delivering only the delta") {
    val in = Files.createTempDirectory("graft-jsonl-mbr").toString
    val ck = Files.createTempDirectory("graft-jsonl-mbrck").toString
    Files.writeString(Paths.get(in, "b1.jsonl"),
      """{"place_id":"1","name":"a","page":1,"latitude":37.5}
        |{"place_id":"2","name":"b","page":1,"latitude":35.1}
        |""".stripMargin)
    // sink = our recoverable jsonl sink (the memory sink refuses
    // checkpoint recovery, which is exactly what this test exercises)
    val out = Files.createTempDirectory("graft-jsonl-mbrout").toString
    var lastInputRows = -1L
    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.sources.v2.JsonLinesSource").schema(schema).load(in)
        .writeStream.format("graft.sources.v2.JsonLinesSource")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      lastInputRows = q.recentProgress.map(_.numInputRows).sum
    }
    runOnce()
    assert(readFrom(out).count() == 2 && lastInputRows == 2)
    // a new crawl batch lands; the RESTARTED query (same checkpoint)
    // must read ONLY the new file — the committed offset already
    // covers b1.jsonl, so a re-read would land 5 rows, not 3
    Files.writeString(Paths.get(in, "b2.jsonl"),
      """{"place_id":"3","name":"c","page":2,"latitude":36.0}
        |""".stripMargin)
    runOnce()
    assert(lastInputRows == 1,
      "restart must deliver the delta file only, resumed from the offset log")
    // union over the two incarnations ≡ a batch read of the source dir
    val streamed = readFrom(out)
    val batch = readFrom(in)
    assert(streamed.count() == 3 && streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streamed-over-restarts must equal the batch read")
  }

  test("micro-batch read: pruning and pushdown apply per batch") {
    val in = Files.createTempDirectory("graft-jsonl-mbp").toString
    val ck = Files.createTempDirectory("graft-jsonl-mbpck").toString
    Files.writeString(Paths.get(in, "b1.jsonl"),
      """{"place_id":"1","name":"a","page":1,"latitude":37.5}
        |{"place_id":"2","name":"b","page":2,"latitude":35.1}
        |{"place_id":"3","name":"c","page":2,"latitude":33.0}
        |""".stripMargin)
    val q = spark.readStream
      .format("graft.sources.v2.JsonLinesSource").schema(schema).load(in)
      .filter(col("page") === 2 && col("latitude") > 34.0)
      .select("place_id")
      .writeStream.format("memory").queryName("mbp")
      .option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("mbp").collect().map(_.getString(0)).toSeq == Seq("2"))
  }

  // ------------------------------------------------------ limit / top-N pushdown

  test("pushed limit caps rows per FILE; pushed top-N matches the full sort (eviction exercised)") {
    // limit 1 over 2 files: each reader emits at most 1 row, the
    // global limit then takes 1 — the scan never materializes all 6
    val limited = read.limit(1)
    assert(limited.queryExecution.executedPlan.toString.contains("PushedLimit: 1"))
    assert(limited.count() == 1)
    // row-level proof of the per-file cap: a limit-2 reader stops
    // after 2 of p1's 4 rows
    val reader = new graft.sources.v2.JsonLinesReader(
      new java.io.File(dir, "p1.jsonl").getPath, schema, schema,
      Array.empty, Some(2))
    var n = 0
    while (reader.next()) n += 1
    reader.close()
    assert(n == 2, s"limit-2 reader must stop after 2 of p1's 4 rows, got $n")
    // top-N with n=3 < matching rows forces heap eviction; the result
    // multiset must equal the full sort's first 3 on every key shape
    // (multiset compare — ties between the two null-latitude rows make
    // the ORDER within the top-3 legitimately engine-chosen)
    for ((cols, key) <- Seq(
        (Seq(col("latitude").asc), "lat asc (nulls first, tie)"),
        (Seq(col("latitude").desc, col("place_id").asc), "lat desc, id asc"),
        (Seq(col("name").desc), "name desc (UTF-8)"))) {
      val pushed = read.orderBy(cols: _*).limit(3)
      assert(pushed.queryExecution.executedPlan.toString.contains("PushedTopN"),
        s"$key: ${pushed.queryExecution.executedPlan}")
      val expect = read.orderBy(cols: _*).collect().take(3)
        .map(_.toString).sorted.toSeq
      assert(pushed.collect().map(_.toString).sorted.toSeq == expect, key)
    }
  }

  test("append accumulates; overwrite truncates; no temp files remain") {
    val out = Files.createTempDirectory("graft-jsonl-a").toString
    sample.write.format("graft.sources.v2.JsonLinesSource").mode("append").save(out)
    sample.write.format("graft.sources.v2.JsonLinesSource").mode("append").save(out)
    assert(readFrom(out).count() == 4)
    sample.limit(1).write.format("graft.sources.v2.JsonLinesSource")
      .mode("overwrite").save(out)
    assert(readFrom(out).count() == 1)
    val leftovers = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith(".tmp-"))
    assert(leftovers.isEmpty, leftovers.mkString(", "))
  }
}
