package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sketch/approximate aggregations — the constant-memory per-group
  * path for 100 TB cardinalities and quantiles. Sketch internals are
  * engine-specific, so the DuckDB oracle checks each estimate the way
  * a production pipeline would: the EXACT answer travels alongside an
  * in-engine estimate-within-published-bound boolean — the oracle
  * pins the exact columns byte-for-byte and the booleans to TRUE, so
  * a broken sketch (or a violated bound) breaks the hash. Spark's
  * sketches are deterministic (hash-based, no RNG), so the booleans
  * are stable across runs and partitionings.
  */
object SketchQueries {

  val queries: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q37
    // HyperLogLog++ distinct users per event type: shuffles one sketch
    // per (group, partition) instead of every distinct value. The
    // exact side is the q76 two-stage distinct (skew-safe, no Expand);
    // approx_ok checks the HLL estimate against 3x its configured rsd.
    Q("q37_approx_distinct",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(count(*) AS BIGINT) AS n,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val exact = ev.select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type")).agg(count(lit(1)).as("exact_users"))
      val approx = ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          count(lit(1)).as("n"))
      approx.join(exact, Seq("event_type"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("approx_users").cast("double") / col("exact_users").cast("double")
            - 1.0) <= 0.06).as("approx_ok"))
        .orderBy(col("event_type"))
    },

    // ---------------------------------------------------------------- q38
    // GK-sketch quantiles of event value per type. Exact percentiles
    // (the q69-verified percentile/quantile_cont parity) ride along;
    // each approx value must land between the exact percentiles at
    // q ± 0.01 — 10x the sketch's published 1/accuracy rank error, so
    // the check is deterministic-with-margin yet still falsifies a
    // broken sketch.
    Q("q38_approx_quantiles",
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99,
        |  TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val qs = percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(1000))
      // ONE array-percentile aggregate: the exact targets and the
      // eight bound probes share a single per-group sort instead of
      // nine independent percentile aggregates (9x the sort work)
      val es = expr(
        "percentile(value, array(0.5D, 0.9D, 0.99D, 0.49D, 0.51D, 0.89D, 0.91D, 0.98D, 1.0D))")
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(es.as("es"), qs.as("qs"))
        .select(col("event_type"),
          graft.ops.Exact.duckRound(col("es").getItem(0), 6).as("p50"),
          graft.ops.Exact.duckRound(col("es").getItem(1), 6).as("p90"),
          graft.ops.Exact.duckRound(col("es").getItem(2), 6).as("p99"),
          col("qs").getItem(0).between(col("es").getItem(3), col("es").getItem(4)).as("ok50"),
          col("qs").getItem(1).between(col("es").getItem(5), col("es").getItem(6)).as("ok90"),
          col("qs").getItem(2).between(col("es").getItem(7), col("es").getItem(8)).as("ok99"))
        .orderBy(col("event_type"))
    },

    // ---------------------------------------------------------------- q113
    // Mergeable-sketch rollup: per-type Apache DataSketches HLL
    // sketches (hll_sketch_agg) union into the global distinct-user
    // estimate WITHOUT rescanning rows — hll_union_agg merges the
    // per-group sketch blobs. This is the re-aggregation contract a
    // 100 TB cube needs: per-slice sketches persist once, any rollup
    // (day→month, type→all) is a merge of sketch bytes, never a
    // second pass over the data. q37 verifies one-shot estimation;
    // this verifies MERGE correctness: the merged estimate must sit
    // within 3x the lgK=12 rsd (~1.6%) of the exact global distinct.
    // Exact sides are two-stage distincts (no Expand, q40 lesson);
    // the ALL row combines the two scalar aggregates by union + max
    // per column — the q103 pattern, never a constant-key join.
    Q("q113_sketch_rollup",
      """SELECT event_type AS scope,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT), TRUE FROM events
        |ORDER BY scope""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"), col("user_id"))
      val perSk = ev.groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      // count(user_id) after the distinct, not count(*): NULL user_ids
      // must not count as a distinct value (DuckDB's count(DISTINCT x)
      // and hll_sketch_agg both skip NULLs) while an all-NULL group
      // still keeps its row — count(col) gives both for free.
      val per = ev.distinct()
        .groupBy(col("event_type"))
        .agg(count(col("user_id")).cast("long").as("exact_users"))
        .join(perSk.select(col("event_type"),
          hll_sketch_estimate(col("sk")).cast("double").as("est")), Seq("event_type"))
        .select(col("event_type").as("scope"), col("exact_users"), col("est"))
      val allExact = ev.select(col("user_id")).distinct()
        .agg(count(col("user_id")).cast("long").as("exact_users"))
        .select(col("exact_users"), lit(null).cast("double").as("est"))
      val allEst = perSk.agg(hll_union_agg(col("sk")).as("sk"))
        .select(lit(null).cast("long").as("exact_users"),
          hll_sketch_estimate(col("sk")).cast("double").as("est"))
      val allRow = allExact.unionByName(allEst)
        .agg(max(col("exact_users")).as("exact_users"), max(col("est")).as("est"))
        .select(lit("ALL").as("scope"), col("exact_users"), col("est"))
      per.unionByName(allRow)
        .select(col("scope"), col("exact_users"),
          (abs(col("est") / col("exact_users").cast("double") - 1.0) <= 0.05)
            .as("approx_ok"))
        .orderBy(col("scope"))
    },

    // ---------------------------------------------------------------- q120
    // Mergeable QUANTILE sketch rollup — q113's re-aggregation
    // contract for percentiles: the sketch is a fixed-width histogram
    // (bin = floor(value / 8.0); W = 8 is a power of two, so the
    // division is an exponent shift — bit-exact on every IEEE engine,
    // no transcendental binning), stored as plain (scope, bin, cnt)
    // rows. Per-type sketches materialize ONCE (localCheckpoint —
    // the tiny many-branch intermediate rule); the ALL rollup is a
    // groupBy(bin) sum over those sketch ROWS — the events table is
    // not rescanned. The binned quantile est_q = upper edge of the
    // first bin whose cumulative count reaches rank ceil(q*n) is
    // fully deterministic, so unlike q38 the ESTIMATE ITSELF is
    // hash-checked, not just bound-checked. The discrete order stat
    // x_(rank) rides along (verification-only rescan, like q113's
    // exact side) and pins the histogram invariant 0 < est − x ≤ W:
    // x lives in [bW, (b+1)W) ⇒ the booleans are deterministically
    // TRUE — a broken merge, cum, or rank breaks est50/est90/est99
    // hashes AND flips a boolean.
    Q("q120_quantile_sketch_rollup",
      """WITH v AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |vs AS (SELECT event_type AS scope, value FROM v
        |       UNION ALL SELECT 'ALL', value FROM v),
        |b AS (SELECT scope, CAST(floor(value / 8.0) AS BIGINT) AS bin FROM vs),
        |sk AS (SELECT scope, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |cum AS (SELECT scope, bin,
        |         sum(cnt) OVER (PARTITION BY scope ORDER BY bin) AS cum,
        |         sum(cnt) OVER (PARTITION BY scope) AS n FROM sk),
        |est AS (SELECT scope, CAST(max(n) AS BIGINT) AS n,
        |         min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT) THEN (bin + 1) * 8.0 END) AS est50,
        |         min(CASE WHEN cum >= CAST(ceil(0.9 * n) AS BIGINT) THEN (bin + 1) * 8.0 END) AS est90,
        |         min(CASE WHEN cum >= CAST(ceil(0.99 * n) AS BIGINT) THEN (bin + 1) * 8.0 END) AS est99
        |       FROM cum GROUP BY scope),
        |rk AS (SELECT scope, value,
        |        row_number() OVER (PARTITION BY scope ORDER BY value) AS rn,
        |        count(*) OVER (PARTITION BY scope) AS n FROM vs),
        |ex AS (SELECT scope,
        |        max(CASE WHEN rn <= CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS x50,
        |        max(CASE WHEN rn <= CAST(ceil(0.9 * n) AS BIGINT) THEN value END) AS x90,
        |        max(CASE WHEN rn <= CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS x99
        |      FROM rk GROUP BY scope)
        |SELECT e.scope, n, est50, est90, est99, x50, x90, x99,
        |  TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM est e JOIN ex ON e.scope = ex.scope
        |ORDER BY e.scope""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val W = 8.0
      val v = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), col("value"))
      // the persisted per-type sketch artifact (tiny: scopes x bins)
      val sk = v
        .groupBy(col("event_type"),
          floor(col("value") / W).cast("long").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      // rollup = merge of sketch ROWS only; no second events scan
      val skAll = sk.groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
        .select(lit("ALL").as("scope"), col("bin"), col("cnt"))
      val skS = sk.select(col("event_type").as("scope"), col("bin"), col("cnt"))
        .unionByName(skAll)
      val cum = skS
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("scope")).orderBy(col("bin"))))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("scope"))))
      def est(q: Double) = min(when(
        col("cum") >= ceil(lit(q) * col("n")),
        (col("bin") + 1).cast("double") * W))
      val ests = cum.groupBy(col("scope")).agg(
        max(col("n")).cast("long").as("n"),
        est(0.5).as("est50"), est(0.9).as("est90"), est(0.99).as("est99"))
      // verification-only rescan: the discrete order stat at the same
      // rank, per scope (one shuffle; both windows share the sort)
      val vs = v.select(col("event_type").as("scope"), col("value"))
        .unionByName(v.select(lit("ALL").as("scope"), col("value")))
      val rk = vs
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("scope")).orderBy(col("value"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("scope"))))
      def xq(q: Double) = max(when(
        col("rn") <= ceil(lit(q) * col("n")), col("value")))
      val exact = rk.groupBy(col("scope")).agg(
        xq(0.5).as("x50"), xq(0.9).as("x90"), xq(0.99).as("x99"))
      ests.join(exact, Seq("scope"))
        .select(col("scope"), col("n"),
          col("est50"), col("est90"), col("est99"),
          col("x50"), col("x90"), col("x99"),
          (col("est50") > col("x50") && col("est50") - col("x50") <= W).as("ok50"),
          (col("est90") > col("x90") && col("est90") - col("x90") <= W).as("ok90"),
          (col("est99") > col("x99") && col("est99") - col("x99") <= W).as("ok99"))
        .orderBy(col("scope"))
    },

    // ---------------------------------------------------------------- q67
    // Count-Min-Sketch-prefiltered heavy hitters (custom typed
    // Aggregator — functions/CmsAgg). The sketch prunes candidates
    // with zero false negatives, exact counts decide — so the output
    // is exact and the oracle is a plain GROUP BY ... HAVING over the
    // same relative threshold (1% of occurrences).
    Q("q67_heavy_hitters",
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |SELECT w, CAST(count(*) AS BIGINT) AS n FROM t
        |GROUP BY w
        |HAVING count(*) >= (SELECT count(*) // 100 FROM t)
        |ORDER BY w""".stripMargin) { (s, d) =>
      import s.implicits._
      val words = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w")).as[String]
      val threshold = words.count() / 100
      graft.functions.CmsAgg.heavyHitters(words, threshold)
        .orderBy("w")
    },

    // ---------------------------------------------------------------- q164
    // KMV (bottom-k) distinct sketch with SET OPERATIONS — the
    // capability HLL lacks: two HLL sketches union but cannot
    // intersect, while per-source shingle-vocabulary KMV sketches
    // (64 rows of state each) answer |A|, |B|, |A∪B| AND |A∩B| for
    // all 190 source pairs without rescanning the corpus. q150
    // answers source overlap as a Jaccard FRACTION from MinHash;
    // this is the same question at absolute-cardinality level, from
    // mergeable bottom-k state. The exact arm rides along (the
    // q150/q142 audit pattern) so the gate hash-pins both the
    // sketch DETERMINISM (sha-48-bit hashes, integer-division
    // estimator — bit-equal on any engine) and the estimates'
    // relationship to truth on this corpus (~1.3k shingles/source
    // at sf0.01 — genuinely above K, the estimator path runs). All
    // integer arithmetic: est = (K-1)·2^48 div kth_min, est_inter =
    // (n_common · est_union) div |merged| (Beyer et al. SIGMOD'07).
    // Corpus-side work is one distinct + one WindowGroupLimit-pruned
    // rank per scope; pair-stage state is |sources|²·K rows.
    Q("q164_kmv_set_ops",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |idx AS (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i FROM w),
         |shs AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s FROM idx),
         |src AS (SELECT doc_id, source FROM documents),
         |memb AS (SELECT DISTINCT source, s FROM shs JOIN src USING (doc_id)),
         |${kmvCtes("source", "memb", "s")},
         |prs AS (SELECT a.source AS s1, b.source AS s2
         |        FROM (SELECT DISTINCT source FROM documents) a
         |        JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source),
         |mg AS (SELECT s1, s2, h, max(fa) AS fa, max(fb) AS fb FROM (
         |    SELECT p.s1, p.s2, k.h, 1 AS fa, 0 AS fb FROM prs p JOIN sk k ON k.source = p.s1
         |    UNION ALL
         |    SELECT p.s1, p.s2, k.h, 0 AS fa, 1 AS fb FROM prs p JOIN sk k ON k.source = p.s2)
         |  GROUP BY s1, s2, h),
         |mtop AS (SELECT s1, s2, CAST(count(*) AS BIGINT) AS ns,
         |           max(CASE WHEN rn = $KMV_K THEN h END) AS kth,
         |           CAST(sum(fa * fb) AS BIGINT) AS n_common
         |         FROM (SELECT s1, s2, h, fa, fb,
         |                 row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn FROM mg)
         |         WHERE rn <= $KMV_K GROUP BY s1, s2),
         |uest AS (SELECT s1, s2, n_common, ns,
         |    CAST(CASE WHEN ns < $KMV_K THEN ns ELSE $KMV_NUM // kth END AS BIGINT) AS est_union
         |  FROM mtop),
         |vsz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM memb GROUP BY source),
         |vin AS (SELECT a.source AS s1, b.source AS s2, CAST(count(*) AS BIGINT) AS c
         |        FROM memb a JOIN memb b ON a.s = b.s AND a.source < b.source
         |        GROUP BY 1, 2)
         |SELECT u.s1, u.s2,
         |  x.nv AS exact_a, y.nv AS exact_b,
         |  CAST(x.nv + y.nv - coalesce(vin.c, 0) AS BIGINT) AS exact_union,
         |  CAST(coalesce(vin.c, 0) AS BIGINT) AS exact_inter,
         |  ea.est AS est_a, eb.est AS est_b, u.est_union,
         |  CAST((u.n_common * u.est_union) // u.ns AS BIGINT) AS est_inter
         |FROM uest u JOIN vsz x ON x.source = u.s1
         |            JOIN vsz y ON y.source = u.s2
         |            LEFT JOIN vin ON vin.s1 = u.s1 AND vin.s2 = u.s2
         |            JOIN sest ea ON ea.source = u.s1
         |            JOIN sest eb ON eb.source = u.s2
         |ORDER BY u.s1, u.s2""".stripMargin) { (s, d) =>
      import graft.analytics.Kmv
      val docs = Tables.documents(s, d)
      // memb feeds 4 branches (sketch, vsz, both vin sides) — the
      // ≥3-branch persist rule was A/B'd here (sf0.1, same boot,
      // isolated best-of-2 ×2): plain 1.89/2.29 s vs eager
      // localCheckpoint 2.74/1.94 s — a WASH, same verdict as
      // q150's A/B and for the same reason: the shared input is a
      // cheap map-side shingle explode + distinct, so each branch
      // only repays a scan, not a shuffle. Keep the plain spelling.
      val memb = graft.analytics.TextAnalysis
        .shingleSet(docs, 3, idCol = "source")
        .distinct()
      val sk = Kmv.sketch(memb, col("source"), col("s"))
      val sest = Kmv.estimate(sk)
      val pe = Kmv.pairEstimates(sk)
      val vsz = memb.groupBy(col("source")).agg(count(lit(1)).as("nv"))
      val vin = memb.as("a")
        .join(memb.as("b"),
          col("a.s") === col("b.s") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("c"))
      pe
        .join(vsz.select(col("source").as("s1"), col("nv").as("exact_a")), Seq("s1"))
        .join(vsz.select(col("source").as("s2"), col("nv").as("exact_b")), Seq("s2"))
        .join(vin, Seq("s1", "s2"), "left")
        .join(sest.select(col("scope").as("s1"), col("est").as("est_a")), Seq("s1"))
        .join(sest.select(col("scope").as("s2"), col("est").as("est_b")), Seq("s2"))
        .select(col("s1"), col("s2"), col("exact_a"), col("exact_b"),
          (col("exact_a") + col("exact_b") - coalesce(col("c"), lit(0L)))
            .cast("long").as("exact_union"),
          coalesce(col("c"), lit(0L)).cast("long").as("exact_inter"),
          col("est_a"), col("est_b"), col("est_union"), col("est_inter"))
        .orderBy("s1", "s2")
    },

    // ---------------------------------------------------------------- q168
    // ANALYZE-style column-statistics collection — the table-stats
    // pass every warehouse runs before planning: per column, row
    // count, null count, EXACT ndv and the KMV estimate next to it
    // with a reported (not asserted) within-25% verdict — the
    // q37/q98 audit convention: the gate hash-pins estimate AND
    // truth, so a user sees exactly what the constant-memory path
    // costs in accuracy before trusting it at 100 TB (where the
    // exact arm is the thing you can no longer afford: per-column
    // distincts over 10¹² rows vs 64 longs per column). One
    // union-of-column-projections pass (each scan column-pruned),
    // two-stage distinct for exact ndv (no Expand), Kmv.sketch over
    // the same (column, value) rows. min/max are deliberately
    // absent: parquet footers already carry them; ndv is the stat
    // that needs a pass.
    Q("q168_column_stats",
      s"""WITH u AS (
         |  SELECT 'l_orderkey' AS c, CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
         |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
         |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem),
         |base AS (SELECT c, CAST(count(*) AS BIGINT) AS n_rows,
         |           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
         |         FROM u GROUP BY c),
         |dv AS (SELECT DISTINCT c, v FROM u WHERE v IS NOT NULL),
         |ndx AS (SELECT c, CAST(count(*) AS BIGINT) AS ndv FROM dv GROUP BY c),
         |${kmvCtes("c", "dv", "v")}
         |SELECT b.c AS column_name, b.n_rows, b.n_null,
         |  ndx.ndv AS ndv_exact, sest.est AS ndv_kmv,
         |  abs(sest.est - ndx.ndv) * 4 <= ndx.ndv AS est_ok
         |FROM base b JOIN ndx ON ndx.c = b.c JOIN sest ON sest.c = b.c
         |ORDER BY column_name""".stripMargin) { (s, d) =>
      import graft.analytics.Kmv
      val li = Tables.lineitem(s, d)
      def proj(name: String, c: org.apache.spark.sql.Column) =
        li.select(lit(name).as("c"), c.cast("string").as("v"))
      val u = proj("l_orderkey", col("l_orderkey"))
        .unionByName(proj("l_partkey", col("l_partkey")))
        .unionByName(proj("l_suppkey", col("l_suppkey")))
        .unionByName(proj("l_returnflag", col("l_returnflag")))
        .unionByName(proj("l_linestatus", col("l_linestatus")))
      val base = u.groupBy(col("c"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"))
      val dv = u.filter(col("v").isNotNull).distinct()
      val ndx = dv.groupBy(col("c")).agg(count(lit(1)).as("ndv"))
      val sest = Kmv.estimate(Kmv.sketch(dv, col("c"), col("v")))
        .select(col("scope").as("c"), col("est"))
      base.join(ndx, Seq("c")).join(sest, Seq("c"))
        .select(col("c").as("column_name"), col("n_rows"), col("n_null"),
          col("ndv").as("ndv_exact"), col("est").as("ndv_kmv"),
          (abs(col("est") - col("ndv")) * 4 <= col("ndv")).as("est_ok"))
        .orderBy("column_name")
    },

    // ---------------------------------------------------------------- q174
    // Incremental column statistics — q168's O(Δ) nightly lifecycle
    // (the q97/q102/q117/q167 contract applied to ANALYZE): the
    // stats STORE holds per-column counts + KMV sketch rows for the
    // ingested base; a delta computes its own stats in isolation
    // and MERGES — counts add, sketches bottom-K-merge — without
    // touching old data. The gate is the identity proof in its
    // strongest form: min-K associativity makes the merged ndv
    // estimate equal the full-recompute estimate BIT FOR BIT (not
    // within a bound), so the oracle is simply q168's from-first-
    // principles chain over the full table. This is why the stats
    // are KMV-shaped at all: exact ndv is not mergeable without
    // corpus-sized state, and a 100 TB nightly ANALYZE must be
    // delta-priced.
    Q("q174_incremental_column_stats",
      s"""WITH u AS (
         |  SELECT 'l_orderkey' AS c, CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
         |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
         |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem),
         |base AS (SELECT c, CAST(count(*) AS BIGINT) AS n_rows,
         |           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
         |         FROM u GROUP BY c),
         |dv AS (SELECT DISTINCT c, v FROM u WHERE v IS NOT NULL),
         |${kmvCtes("c", "dv", "v")}
         |SELECT b.c AS column_name, b.n_rows, b.n_null, sest.est AS ndv_kmv
         |FROM base b JOIN sest ON sest.c = b.c
         |ORDER BY column_name""".stripMargin) { (s, d) =>
      import graft.analytics.Kmv
      val li = Tables.lineitem(s, d)
      def statsOf(rows: org.apache.spark.sql.DataFrame) = {
        def proj(name: String, c: org.apache.spark.sql.Column) =
          rows.select(lit(name).as("c"), c.cast("string").as("v"))
        val u = proj("l_orderkey", col("l_orderkey"))
          .unionByName(proj("l_partkey", col("l_partkey")))
          .unionByName(proj("l_suppkey", col("l_suppkey")))
          .unionByName(proj("l_returnflag", col("l_returnflag")))
          .unionByName(proj("l_linestatus", col("l_linestatus")))
        val counts = u.groupBy(col("c"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"))
        val sk = Kmv.sketch(u.filter(col("v").isNotNull), col("c"), col("v"))
        (counts, sk)
      }
      // the persisted nightly store (base) + tonight's delta, merged
      val (bc, bs) = statsOf(li.filter(col("l_orderkey") % 4 =!= 0))
      val (dc, ds) = statsOf(li.filter(col("l_orderkey") % 4 === 0))
      val mergedCounts = bc.unionByName(dc).groupBy(col("c"))
        .agg(sum(col("n_rows")).as("n_rows"), sum(col("n_null")).as("n_null"))
      val mergedEst = Kmv.estimate(Kmv.merge(bs, ds))
        .select(col("scope").as("c"), col("est"))
      mergedCounts.join(mergedEst, Seq("c"))
        .select(col("c").as("column_name"), col("n_rows"), col("n_null"),
          col("est").as("ndv_kmv"))
        .orderBy("column_name")
    },

    // ---------------------------------------------------------------- q181
    // Heavy-tail-safe quantile sketch (analytics/LogHist): q120's
    // mergeable histogram rollup with LOG₂ buckets — bucket = bit
    // length of the integer value (length of bin(v): pure integer,
    // transcendental-free, identical on both engines), estimate =
    // inclusive bucket edge 2^bin − 1 at rank ⌈q·n⌉. Fixed-W bins
    // guarantee absolute error ≤ W — unbounded RELATIVE error on
    // heavy-tailed domains (token counts: median 30, tail 10⁴); the
    // log sketch guarantees x ≤ est < 2·x at EVERY magnitude with 64
    // buckets for the whole BIGINT range. Same lifecycle as q120:
    // per-source sketches persist once (localCheckpoint), the ALL
    // rollup merges sketch ROWS (groupBy-sum — lossless, no corpus
    // rescan; SketchSpec proves merge ≡ re-sketch exactly), the
    // discrete order stat rides along verification-only and the
    // factor-2 envelope booleans are deterministically TRUE.
    Q("q181_log_quantile_sketch",
      """WITH v AS (SELECT source AS scope,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |           FROM documents),
        |vs AS (SELECT scope, tok FROM v UNION ALL SELECT 'ALL', tok FROM v),
        |b AS (SELECT scope, CAST(length(bin(tok)) AS BIGINT) AS bin FROM vs),
        |sk AS (SELECT scope, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |cum AS (SELECT scope, bin,
        |         sum(cnt) OVER (PARTITION BY scope ORDER BY bin) AS cum,
        |         sum(cnt) OVER (PARTITION BY scope) AS n FROM sk),
        |est AS (SELECT scope, CAST(max(n) AS BIGINT) AS n,
        |         CAST(min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |           THEN CASE WHEN bin >= 63 THEN 9223372036854775807
        |                ELSE (1::BIGINT << bin) - 1 END END) AS BIGINT) AS est50,
        |         CAST(min(CASE WHEN cum >= CAST(ceil(0.9 * n) AS BIGINT)
        |           THEN CASE WHEN bin >= 63 THEN 9223372036854775807
        |                ELSE (1::BIGINT << bin) - 1 END END) AS BIGINT) AS est90,
        |         CAST(min(CASE WHEN cum >= CAST(ceil(0.99 * n) AS BIGINT)
        |           THEN CASE WHEN bin >= 63 THEN 9223372036854775807
        |                ELSE (1::BIGINT << bin) - 1 END END) AS BIGINT) AS est99
        |       FROM cum GROUP BY scope),
        |rk AS (SELECT scope, tok,
        |        row_number() OVER (PARTITION BY scope ORDER BY tok) AS rn,
        |        count(*) OVER (PARTITION BY scope) AS n FROM vs),
        |ex AS (SELECT scope,
        |        CAST(max(CASE WHEN rn <= CAST(ceil(0.5 * n) AS BIGINT) THEN tok END) AS BIGINT) AS x50,
        |        CAST(max(CASE WHEN rn <= CAST(ceil(0.9 * n) AS BIGINT) THEN tok END) AS BIGINT) AS x90,
        |        CAST(max(CASE WHEN rn <= CAST(ceil(0.99 * n) AS BIGINT) THEN tok END) AS BIGINT) AS x99
        |      FROM rk GROUP BY scope)
        |SELECT e.scope, n, est50, est90, est99, x50, x90, x99,
        |  est50 >= x50 AND est50 < 2 * x50 AS ok50,
        |  est90 >= x90 AND est90 < 2 * x90 AS ok90,
        |  est99 >= x99 AND est99 < 2 * x99 AS ok99
        |FROM est e JOIN ex ON e.scope = ex.scope
        |ORDER BY e.scope""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.analytics.LogHist
      val v = Tables.documents(s, d)
        .select(col("source").as("scope"),
          size(split(col("text"), " ")).cast("long").as("v"))
      // per-source sketch: the persisted artifact (tiny: scopes × ~14 bins)
      val sk = LogHist.sketch(v).localCheckpoint(true)
      // ALL rollup merges sketch rows only — no second corpus scan
      val skS = sk.unionByName(
        LogHist.merge(sk.withColumn("scope", lit("ALL"))))
      val ests = LogHist.quantiles(skS,
        Seq("est50" -> 0.5, "est90" -> 0.9, "est99" -> 0.99))
      // verification-only rescan: discrete order stats at the same ranks
      val vs = v.unionByName(v.withColumn("scope", lit("ALL")))
      val rk = vs
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("scope")).orderBy(col("v"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("scope"))))
      def xq(q: Double, name: String) = max(when(
        col("rn") <= ceil(lit(q) * col("n")), col("v"))).as(name)
      val exact = rk.groupBy(col("scope"))
        .agg(xq(0.5, "x50"), xq(0.9, "x90"), xq(0.99, "x99"))
      ests.join(exact, Seq("scope"))
        .select(col("scope"), col("n"),
          col("est50"), col("est90"), col("est99"),
          col("x50"), col("x90"), col("x99"),
          (col("est50") >= col("x50") && col("est50") < lit(2) * col("x50")).as("ok50"),
          (col("est90") >= col("x90") && col("est90") < lit(2) * col("x90")).as("ok90"),
          (col("est99") >= col("x99") && col("est99") < lit(2) * col("x99")).as("ok99"))
        .orderBy(col("scope"))
    }
  )

  /** DuckDB mirror of Kmv.hash48: 12 sha-256 hex nibbles → 48-bit
    * BIGINT (no conv in DuckDB 1.0 — strpos decode per nibble). */
  private def hash48Sql: String = {
    val hex = "0123456789abcdef"
    (0 until 12).map { i =>
      val mult = 1L << (4 * (11 - i))
      s"CAST(strpos('$hex', substr(hh, ${i + 1}, 1)) - 1 AS BIGINT) * $mult"
    }.mkString(" + ")
  }
  private def KMV_K: Int = graft.analytics.Kmv.K
  private def KMV_NUM: Long = graft.analytics.Kmv.EST_NUM

  /** Shared KMV estimator CTE chain (DuckDB mirror of Kmv.sketch +
    * Kmv.estimate) over a `srcCte` holding ($scope, $elem) rows:
    * emits `hs` → `sk` (bottom-K rows) → `se` → `sest` (per-scope
    * estimate). One spelling for every KMV consumer (q164, q168) —
    * the batteryCtes rule applied to the sketch oracle. */
  private def kmvCtes(scope: String, srcCte: String, elem: String): String =
    s"""hs AS (SELECT DISTINCT $scope, $hash48Sql AS h
       |       FROM (SELECT $scope, substr(sha256($elem), 1, 12) AS hh FROM $srcCte)),
       |sk AS (SELECT $scope, h, rn FROM (
       |    SELECT $scope, h, row_number() OVER (PARTITION BY $scope ORDER BY h) AS rn
       |    FROM hs) WHERE rn <= $KMV_K),
       |se AS (SELECT $scope, CAST(count(*) AS BIGINT) AS ns,
       |         max(CASE WHEN rn = $KMV_K THEN h END) AS kth
       |       FROM sk GROUP BY $scope),
       |sest AS (SELECT $scope,
       |    CAST(CASE WHEN ns < $KMV_K THEN ns ELSE $KMV_NUM // kth END AS BIGINT) AS est
       |  FROM se)""".stripMargin
}
