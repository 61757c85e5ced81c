package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.{AsOfJoin, RangeJoin}

/** Extended training-data operators: subword tokenization, char-gram
  * fingerprinting, and the as-of join.
  */
object ExtQueries {

  /** BPE-ish piece pattern: letter runs, digit runs, single symbols —
    * identical RE2/Java semantics. */
  private val PIECE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  val queries: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q39
    // Subword-ish token counting (the regex stand-in for a BPE
    // tokenizer: letter runs / digit runs / symbols as pieces).
    Q("q39_subword_tokens",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(lower(text), '$PIECE')) AS BIGINT) AS n_pieces,
         |  CAST(len(list_distinct(regexp_extract_all(lower(text), '$PIECE'))) AS BIGINT) AS n_unique
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(expr(s"regexp_extract_all(lower(text), '$PIECE', 0)")).cast("long").as("n_pieces"),
          size(array_distinct(expr(s"regexp_extract_all(lower(text), '$PIECE', 0)"))).cast("long").as("n_unique"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- q40
    // Char-8-gram rolling fingerprint: min sha over all grams (the
    // winnowing-style document signature; robust to reordering at the
    // edges in a way the whole-text hash is not).
    Q("q40_chargram_fingerprint",
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |           FROM documents),
        |g AS (SELECT doc_id, substr(norm, i, 8) AS gram
        |      FROM (SELECT doc_id, norm, unnest(generate_series(1, length(norm) - 7, 4)) AS i
        |            FROM n WHERE length(norm) >= 8))
        |SELECT doc_id,
        |  min(substr(sha256(gram), 1, 16)) AS fingerprint,
        |  CAST(count(DISTINCT gram) AS BIGINT) AS n_grams
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.analytics.TextAnalysis.normalizeText(col("text")).as("norm"))
        .filter(length(col("norm")) >= 8)
        // stride 4: winnowing-style sampled grams — 4x less hashing
        // for a fingerprint that still covers the whole document
        .select(col("doc_id"), col("norm"),
          explode(sequence(lit(1), length(col("norm")) - 7, lit(4))).as("i"))
        .select(col("doc_id"), expr("substring(norm, i, 8)").as("gram"))
        // dedup grams BEFORE hashing: min(sha) over distinct grams ==
        // min over all grams, so the two-stage groupBy replaces the
        // mixed distinct aggregate (which plans an Expand that doubles
        // the exploded rows) and sha-256 runs only on distinct grams
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("__c"))
        .groupBy(col("doc_id"))
        .agg(
          min(substring(sha2(col("gram"), 256), 1, 16)).as("fingerprint"),
          count(lit(1)).as("n_grams"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- q41
    // As-of join: each event enriched with the user's most recent
    // order as of the event time. Oracle = DuckDB's native ASOF LEFT
    // JOIN; the Spark side is AsOfJoin.leftAsOf (single shuffle +
    // window, no inequality-join explosion).
    Q("q41_asof_join",
      """WITH ro AS (SELECT o_custkey AS k, o_orderdate AS t,
        |                   max(o_orderkey) AS last_orderkey
        |            FROM orders GROUP BY 1, 2)
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  strftime(t, '%Y-%m-%d') AS last_order_date, last_orderkey
        |FROM events ASOF LEFT JOIN ro
        |  ON events.user_id = ro.k AND events.ts >= ro.t
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ro = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("last_orderkey"))
        .select(col("o_custkey").as("k"), col("o_orderdate").as("t"), col("last_orderkey"))
      AsOfJoin.leftAsOf(
          Tables.events(s, d).select("event_id", "user_id", "ts"),
          ro, leftKey = "user_id", rightKey = "k", leftTime = "ts", rightTime = "t")
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          date_format(col("_match.t"), "yyyy-MM-dd").as("last_order_date"),
          col("_match.last_orderkey").as("last_orderkey"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------- q92
    // FORWARD as-of join: each event labeled with the user's NEXT
    // order at-or-after the event time — the label-generation lookup
    // of a training pipeline (next-conversion-after-view). DuckDB has
    // no forward ASOF, so the oracle is the explicit min-future-time
    // formulation; the Spark side is the same single-shuffle
    // union+window as q41, mirrored.
    Q("q92_asof_forward",
      """WITH ro AS (SELECT o_custkey AS k, o_orderdate AS t,
        |                   max(o_orderkey) AS next_orderkey
        |            FROM orders GROUP BY 1, 2),
        |nx AS (SELECT e.event_id, min(ro.t) AS nt
        |       FROM events e LEFT JOIN ro
        |         ON ro.k = e.user_id AND ro.t >= CAST(e.ts AS TIMESTAMP)
        |       GROUP BY e.event_id)
        |SELECT e.event_id, e.user_id, epoch_us(ts) AS ts_us,
        |  strftime(nx.nt, '%Y-%m-%d') AS next_order_date,
        |  r2.next_orderkey
        |FROM events e JOIN nx ON e.event_id = nx.event_id
        |LEFT JOIN ro r2 ON r2.k = e.user_id AND r2.t = nx.nt
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ro = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("next_orderkey"))
        .select(col("o_custkey").as("k"), col("o_orderdate").as("t"), col("next_orderkey"))
      AsOfJoin.leftAsOfForward(
          Tables.events(s, d).select("event_id", "user_id", "ts"),
          ro, leftKey = "user_id", rightKey = "k", leftTime = "ts", rightTime = "t")
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          date_format(col("_match.t"), "yyyy-MM-dd").as("next_order_date"),
          col("_match.next_orderkey").as("next_orderkey"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------- q61
    // Range join via binning: every event falling inside each user's
    // first-hour activity window, counted per window. Spark would plan
    // the bare inequality join as a nested loop; RangeJoin.binned
    // turns it into a bin equi-join + residual filter (same rows,
    // scale-safe). Oracle = DuckDB's native inequality join.
    Q("q61_range_join",
      """WITH iv AS (SELECT user_id AS owner, min(ts) AS lo,
        |                   min(ts) + INTERVAL 1 HOUR AS hi
        |            FROM events GROUP BY 1)
        |SELECT owner, epoch_us(lo) AS lo_us,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts <= iv.hi
        |GROUP BY owner, lo ORDER BY owner""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
      val iv = ev.groupBy(col("user_id").as("owner")).agg(min(col("ts")).as("lo"))
        .withColumn("hi", col("lo") + expr("INTERVAL 1 HOUR"))
      RangeJoin.binned(ev.select("event_id", "ts"), "ts", iv, "lo", "hi", 3600)
        .groupBy(col("owner"), col("lo"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("owner"), unix_micros(col("lo")).as("lo_us"), col("n_events"))
        .orderBy("owner")
    },

    // ---------------------------------------------------------------- q78
    // Interval-overlap join: pairs of users whose first-hour activity
    // windows overlap. Both interval sets bin-explode and equi-join;
    // the emit-once guard (pair kept only in the bin of max(lo1, lo2))
    // surfaces each overlap exactly once with no distinct shuffle.
    Q("q78_interval_overlap",
      """WITH iv AS (SELECT user_id AS u, min(ts) AS lo,
        |                   min(ts) + INTERVAL 1 HOUR AS hi
        |            FROM events GROUP BY 1)
        |SELECT a.u AS u1, b.u AS u2
        |FROM iv a JOIN iv b
        |  ON a.u < b.u AND a.lo <= b.hi AND b.lo <= a.hi
        |ORDER BY u1, u2""".stripMargin) { (s, d) =>
      val iv = Tables.events(s, d)
        .groupBy(col("user_id")).agg(min(col("ts")).as("lo"))
        .withColumn("hi", col("lo") + expr("INTERVAL 1 HOUR"))
      val a = iv.select(col("user_id").as("u1"), col("lo").as("lo1"), col("hi").as("hi1"))
      val b = iv.select(col("user_id").as("u2"), col("lo").as("lo2"), col("hi").as("hi2"))
      RangeJoin.overlapBinned(a, "lo1", "hi1", b, "lo2", "hi2", 3600)
        .filter(col("u1") < col("u2"))
        .select(col("u1"), col("u2"))
        .orderBy("u1", "u2")
    },

    // ---------------------------------------------------------------- q115
    // The DSv2 jsonl source driven end-to-end in STREAMING mode with
    // checkpointed offsets (ST2 as a first-class source contract, not
    // the stateful-dedup emulation): the documents table round-trips
    // batch-write → micro-batch read (Trigger.AvailableNow, offsets
    // committed to the checkpoint log, filter pushed into each batch's
    // scan) → exactly-once streaming jsonl sink → batch read-back.
    // Oracle = the same filter over the parquet table, so the gate
    // hash-checks the whole source→stream→sink chain row for row.
    // Restart-delta behavior (a second incarnation reads only new
    // files) is JsonLinesSourceSpec's recovery test; here every run
    // uses fresh dirs so the measured work is one full pass.
    Q("q115_stream_jsonl_roundtrip",
      """SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id > 50 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types._
      val root = Scratch.fresh("graft-q115")
      val (src, out, ck) = (s"$root/src", s"$root/out", s"$root/ck")
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("lang", StringType), StructField("text", StringType)))
      Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
        .write.format("graft.sources.v2.JsonLinesSource").mode("append").save(src)
      val q = s.readStream
        .format("graft.sources.v2.JsonLinesSource").schema(schema).load(src)
        .filter(col("doc_id") > 50)
        .writeStream.format("graft.sources.v2.JsonLinesSource")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.format("graft.sources.v2.JsonLinesSource").schema(schema).load(out)
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- q116
    // Storage-side aggregation over the DSv2 jsonl source: the scan
    // itself computes per-file COUNT/MIN/MAX partials (pushed through
    // SupportsPushDownAggregates — the completion of the S3-Select
    // emulation, where the storage endpoint answers the SQL and only
    // group rows travel) and Spark merges the partials. PlanSpec
    // asserts PushedAggregates appears in this exact plan; here the
    // gate hash-checks the merged values against the parquet oracle.
    Q("q116_jsonl_agg_pushdown",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      jsonlAggFrame(s, d).orderBy("lang")
    },

    // ---------------------------------------------------------------- q121
    // Storage-side ORDER BY … LIMIT over the DSv2 jsonl source: the
    // scan keeps an n-bounded heap PER FILE under the pushed sort
    // keys (SupportsPushDownTopN; declared partial, so Spark's global
    // TakeOrdered merges the per-file candidates) — only n rows per
    // storage object ever travel, the "head of the manifest" query a
    // 100 TB listing wants. Two keys exercise the comparator: lang
    // DESC (UTF-8 binary string order) with unique doc_id ASC as the
    // deterministic tiebreak. PlanSpec asserts PushedTopN appears in
    // this exact plan; the gate hash-checks the rows against the
    // parquet oracle.
    Q("q121_jsonl_topn_pushdown",
      """SELECT doc_id, lang FROM documents
        |ORDER BY lang DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      jsonlTopNFrame(s, d)
    },

    // ---------------------------------------------------------------- q170
    // CSV round-trip fidelity — the interchange-format face of the
    // source/sink surface next to q115's jsonl round-trip: lineitem
    // columns (long, int, DOUBLE, string, DATE) written as CSV with
    // header, read back under an explicit schema, and the aggregate
    // hash-compared against the oracle computed from the ORIGINAL
    // parquet — any lossiness anywhere (double shortest-repr
    // round-trip, date formatting, header/quoting) breaks the gate.
    // Doubles survive because Spark writes the shortest decimal
    // representation that parses back to the same bits; dates use
    // the ISO default both ways. Aggregation is the decimal-exact
    // dsum convention; dates exit as ISO strings (the q49 rule — no
    // raw DATE column in gate output).
    Q("q170_csv_roundtrip",
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
        |  strftime(min(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS min_ship,
        |  strftime(max(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS max_ship
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types._
      val root = Scratch.fresh("graft-q170").toString
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"), to_date(col("l_shipdate")).as("ship"))
        .write.option("header", "true").mode("overwrite").csv(root)
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
        StructField("l_quantity", DoubleType), StructField("l_returnflag", StringType),
        StructField("ship", DateType)))
      s.read.option("header", "true").schema(schema).csv(root)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          graft.ops.Exact.dsum(col("l_quantity")).as("sum_qty"),
          min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"),
          date_format(min(col("ship")), "yyyy-MM-dd").as("min_ship"),
          date_format(max(col("ship")), "yyyy-MM-dd").as("max_ship"))
        .orderBy("l_returnflag")
    },

    // ---------------------------------------------------------------- q172
    // ORC round-trip — q170's contract on the columnar warehouse
    // format (type-preserving containers, so unlike CSV no schema
    // is re-imposed on read: the round-trip must preserve types BY
    // ITSELF, including the timestamp). Same gate shape: aggregate
    // of the read-back compared against the original-parquet
    // oracle.
    Q("q172_orc_roundtrip",
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val root = Scratch.fresh("graft-q172").toString
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag"), col("l_shipdate"))
        .write.mode("overwrite").orc(root)
      s.read.orc(root)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          graft.ops.Exact.dsum(col("l_quantity")).as("sum_qty"),
          graft.ops.Exact.dsum(col("l_extendedprice")).as("sum_price"),
          date_format(min(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss").as("min_ship"))
        .orderBy("l_returnflag")
    },

    // ---------------------------------------------------------------- q173
    // Parquet schema evolution — the append-only corpus reality: a
    // night-2 writer adds a column (here `score`), and the reader
    // must see ONE unified schema over both file generations with
    // the missing column null-filled (`mergeSchema` — off by
    // default in Spark; silently reading night-1's schema and
    // DROPPING the new column is the failure mode this gate pins).
    // Oracle replicates the two generations as projection unions
    // with explicit NULLs.
    Q("q173_schema_evolution",
      """WITH u AS (
        |  SELECT doc_id, lang, CAST(NULL AS BIGINT) AS score
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS score
        |  FROM documents WHERE doc_id % 2 = 1)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(score) AS BIGINT) AS n_scored,
        |  CAST(sum(score) AS BIGINT) AS sum_score
        |FROM u GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val root = Scratch.fresh("graft-q173").toString
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$root/gen=1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("score"))
        .write.mode("overwrite").parquet(s"$root/gen=2")
      s.read.option("mergeSchema", "true").parquet(s"$root/gen=1", s"$root/gen=2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          count(col("score")).as("n_scored"),
          sum(col("score")).as("sum_score"))
        .orderBy("lang")
    }
  )

  /** q121's frame — shared with PlanSpec, which asserts the scan
    * carries the pushed top-N. */
  def jsonlTopNFrame(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val root = Scratch.fresh("graft-q121")
    val src = s"$root/src"
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType)))
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .write.format("graft.sources.v2.JsonLinesSource").mode("append").save(src)
    s.read.format("graft.sources.v2.JsonLinesSource").schema(schema).load(src)
      .orderBy(col("lang").desc, col("doc_id"))
      .limit(20)
  }

  /** A jsonl copy of documents(doc_id, lang) for spec-level pushdown
    * probes — its own scratch tag, so spec calls cannot delete the
    * tree under q121's still-live frame. */
  def jsonlTopNSrcDir(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val root = Scratch.fresh("graft-q121spec")
    val src = s"$root/src"
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .write.format("graft.sources.v2.JsonLinesSource").mode("append").save(src)
    src
  }

  /** q116's frame without the ORDER BY — shared with PlanSpec, which
    * asserts the scan carries the pushed aggregate. */
  def jsonlAggFrame(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val root = Scratch.fresh("graft-q116")
    val src = s"$root/src"
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType)))
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .write.format("graft.sources.v2.JsonLinesSource").mode("append").save(src)
    s.read.format("graft.sources.v2.JsonLinesSource").schema(schema).load(src)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_id"),
        max(col("doc_id")).as("last_id"))
  }
}
