package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph workloads in the Pregel shape: edges stay put, a
  * node-sized state frame flows between supersteps, and each
  * superstep is ONE shuffle (contributions aggregated into their
  * destination). The near-dup family already covers the
  * connected-components face (DedupOps large-star/small-star); this
  * is the fixed-iteration value-propagation face.
  */
object Graph {

  /** Node-count ceiling for the per-superstep `broadcast(rv)` hint in
    * [[pageRank]]. The rank-value frame is node-sized (src BIGINT/
    * string + a DECIMAL(27,12) ≈ 40–60 B/row → ~50 MB at this bound),
    * and a FORCED hint overrides Spark's autoBroadcastJoinThreshold
    * safety — at web-graph node counts the superstep would OOM the
    * driver collecting the broadcast instead of degrading to a
    * shuffle join. Same ceiling-with-fallback pattern as
    * Similarity.MAX_INLINE_DOUBLES: below the bound the hint wins
    * (map-side join, no edge shuffle for the lookup side); above it
    * the join is left to the planner, which shuffles BOTH sides on
    * src — the correct shape when ranks no longer fit an executor.
    * GraphSpec asserts rank identity across the two plan shapes. */
  val MAX_BROADCAST_NODES: Long = 1L << 20

  /** PageRank over edges (src, dst). The walk is UNDIRECTED: both
    * directions are generated INTERNALLY (the `ee` union below), so
    * feed each edge exactly once — a caller that pre-symmetrizes
    * doubles the checkpointed edge frame and every superstep's
    * shuffle (ranks stay correct only because uniform duplication
    * cancels in r/od). q139 feeds the single s→c direction of the
    * co-purchase graph. Damping 0.85, `iters` supersteps, rank init
    * 1/N.
    *
    * Engine-portable by the q80 rule applied per superstep: each
    * contribution r/outdeg is duckRound'ed to 9 decimals and summed
    * as exact DECIMAL(27,12) — a 9-rounded double casts exactly at
    * scale 12 on every engine (its 12-decimal expansion ends in 000,
    * so neither Spark's shortest-repr cast nor DuckDB's
    * binary-expansion rounding can land on a boundary), which makes
    * every superstep partition-order-independent AND reproducible in
    * the DuckDB oracle. Scale: edges are the big frame and are
    * touched once per superstep in place (localCheckpoint'd up
    * front); ranks and degrees are node-sized — the join side a real
    * cluster would broadcast. Returns (node, r). */
  def pageRank(directedEdges: DataFrame, iters: Int, damping: Double = 0.85,
               teleport: Double = 0.15,
               maxBroadcastNodes: Long = MAX_BROADCAST_NODES): DataFrame = {
    // teleport is a PARAMETER, not computed as 1.0 - damping: in IEEE
    // 1.0 - 0.85 = 0.15000000000000002, which is NOT the double the
    // oracle's literal 0.15 parses to — both constants must be the
    // exact literals the SQL spells
    val e = directedEdges.select(col("src"), col("dst"))
    // both directions: the random walk crosses every edge both ways
    val ee = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true) // the big frame, scanned once per superstep
    // (plain .persist() measured 10.4 s vs 5.6 s for this checkpoint at
    // sf0.1 — severed lineage beats cache bookkeeping here)
    // (NO parallelism floor on ee — A/B'd round 17 and REVERTED: the
    // keyless repartition + second checkpoint of the ~1M-row string-
    // keyed frame measured q139 5.4 → 6.5 s isolated; the sort-before-
    // repartition and re-materialization cost more than the wider
    // superstep map side recovered.)
    // (A LONG node-surrogate dictionary was prototyped round 16: the
    // superstep alone measured 4× less CPU on long keys, but the
    // encode/decode joins added ~1 s of stage latency and the END TO
    // END wall REGRESSED 5.3→6.6 s at sf0.1 — reverted; worth
    // revisiting only when edge volume makes supersteps CPU-bound.)
    // deg doubles as the node list: every node appears as a src in ee
    // (both directions generated), so deg's key set ≡ distinct nodes —
    // the separate `nodes` distinct + checkpoint + count of earlier
    // rounds was a third node-sized frame carrying the same keys
    // (round 17: one frame, one count job)
    val deg = ee.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint(true) // node-sized
    val n = deg.count()
    // broadcast is a HINT gated on n (MAX_BROADCAST_NODES): the rank
    // frame grows linearly with the node count, and forcing it past
    // executor/driver memory would OOM rather than degrade — above
    // the bound the superstep join falls back to the planner's
    // shuffle join (ranks no longer fit one executor anyway)
    val bcastOk = n <= maxBroadcastNodes
    // state carries (src, od, r): folding the out-degree INTO the rank
    // frame removes the per-superstep ranks ⋈ deg join the previous
    // spelling paid inside every broadcast build (round 17) — the
    // contribution value is a row-local expression over the state row.
    var state = deg.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      // the superstep is a single (broadcast, when node-count-gated)
      // join into the edge scan plus one partial-agged shuffle on
      // dst — never an edge-wide multi-join chain.
      // Contributions ride as LONG fixed-point nano-units (round 16):
      // duckRound(x, 9) is by construction the double nearest k·1e-9,
      // so ×1e9 + round recovers the integer k EXACTLY (abs error
      // ≤ k·2⁻⁵² ≪ 0.5 until k ~ 2e15), and the per-edge aggregate
      // becomes a plain LONG sum — the hash-agg update the previous
      // DECIMAL(27,12) spelling paid Int128/BigDecimal arithmetic for
      // (precision > 18 leaves Spark's long-backed Decimal fast path).
      // The exact rational Σk·1e-9 is reconstructed ONCE per node
      // below as DECIMAL(38,9) (28+9+1 digits — no precision loss, no
      // rounding), so cast-to-double equals the old decimal-sum cast
      // bit for bit and the oracle's DECIMAL(27,12) sum stays matched.
      // Overflow headroom: Σk ≤ total-rank-mass·1e9 ≈ n·1e9 — a long
      // holds it to n ≈ 9e9 nodes (ANSI sum would throw, not wrap).
      val rv0 = state.select(col("src"),
        round(Exact.duckRound(col("r") / col("od"), 9) * lit(1e9), 0)
          .cast("long").as("cvn"))
      val rv = if (bcastOk) broadcast(rv0) else rv0
      val contrib = ee.join(rv, Seq("src"))
        .groupBy(col("dst"))
        .agg((sum(col("cvn")).cast(DecimalType(28, 0)) *
          lit(new java.math.BigDecimal("0.000000001"))).cast("double").as("in_sum"))
      state = deg
        .join(contrib, col("src") === col("dst"), "left")
        .select(col("src"), col("od"),
          (lit(teleport) + lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("r"))
        // node-sized; keeps superstep lineage flat. A/B'd against NO
        // per-superstep materialization at iters=5/sf0.1: a wash
        // (4.8/5.1 s checkpointed vs 5.6/4.7 s lazy, same boot) — kept
        // because lineage depth grows with iters and the lazy spelling
        // re-plans the whole chain into one giant DAG
        .localCheckpoint(true)
    }
    state.select(col("src").as("node"), col("r"))
  }

  /** Exact triangle counting by DEGREE-ORIENTED wedge closing (the
    * MapReduce-classic Suri–Vassilvitskii shape): orient every
    * undirected edge from its smaller endpoint under the (degree, id)
    * total order, enumerate wedges only at a triangle's minimum
    * vertex, and close them with one equi-join back on the oriented
    * edge set. Orientation is the whole scale story: out-degree is
    * bounded by O(√m) regardless of hub degree, so the wedge join is
    * O(m^1.5) — on a hub-heavy graph the naive per-node wedge count
    * Σdeg² explodes exactly where this stays flat. Each triangle
    * closes exactly once (its two non-minimum members form ONE
    * oriented pair), so no post-hoc dedup.
    *
    * Input: canonical undirected edges (u, v), u < v, distinct.
    * Output: (node, n_tri) — per-node triangle participation (each
    * triangle credits all three corners). */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("n"))
      .unionByName(edges.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // e carries the TARGET's (degree, id) order key (`td`): the wedge
    // self-join below enumerates each wedge ONCE, in the orientation
    // order, instead of both ordered ways (round 16 — the `=!=`
    // spelling generated 2× the wedge rows, of which only the
    // order-respecting half could close: an oriented edge (y, z)
    // exists only when y precedes z under (degree, id), so the
    // (z, y)-ordered twin of every closable wedge was dead weight
    // through the join, the projection and the close probe).
    val e = edges
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("td")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"), col("du").as("td"))).as("o"))
      .select(col("o.s").as("s"), col("o.t").as("t"), col("o.td").as("td"))
      .localCheckpoint(true) // consumed by the wedge self-join (×2) + close
    val wedges = e.as("e1")
      .join(e.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.td") < col("e2.td") ||
            (col("e1.td") === col("e2.td") && col("e1.t") < col("e2.t"))))
      .select(col("e1.s").as("x"), col("e1.t").as("y"), col("e2.t").as("z"))
    val tri = wedges.join(
      e.select(col("s").as("y"), col("t").as("z")), Seq("y", "z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
