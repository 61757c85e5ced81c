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

  /** PageRank over DIRECTED edges (src, dst), symmetrized by the
    * caller if an undirected walk is wanted — q139 feeds both
    * directions of the co-purchase graph. Damping 0.85, `iters`
    * supersteps, rank init 1/N.
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
               teleport: Double = 0.15): DataFrame = {
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
    val deg = ee.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint(true) // node-sized
    val nodes = ee.select(col("src").as("node")).distinct().localCheckpoint(true)
    val n = nodes.count()
    var ranks = nodes.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      // fold rank/degree into ONE node-sized value frame first, so the
      // superstep is a single broadcast join into the edge scan plus
      // one partial-agged shuffle on dst — never an edge-wide
      // multi-join chain
      val rv = ranks.join(deg, col("node") === col("src"))
        .select(col("src"),
          Exact.duckRound(col("r") / col("od"), 9)
            .cast(DecimalType(27, 12)).as("cv"))
      val contrib = ee.join(broadcast(rv), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("cv")).cast("double").as("in_sum"))
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("r"))
        .localCheckpoint(true) // node-sized; keeps superstep lineage flat
    }
    ranks
  }
}
