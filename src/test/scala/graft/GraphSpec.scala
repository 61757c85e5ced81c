package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** PageRank invariants the q139 oracle can't see: closed-form
  * fixed-point behavior on tiny graphs and partition-layout
  * independence of the superstep arithmetic. */
class GraphSpec extends SparkSpec {

  private def ranksOf(edges: Seq[(String, String)], iters: Int,
                      parts: Int = 1): Map[String, Double] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst").repartition(parts), iters)
      .as[(String, Double)].collect().toMap
  }

  test("two-node cycle: symmetric ranks converging monotonically to 1.0") {
    val r3 = ranksOf(Seq(("a", "b")), 3)
    val r8 = ranksOf(Seq(("a", "b")), 8)
    assert(r3("a") == r3("b") && r8("a") == r8("b"))
    assert(r3("a") < r8("a") && r8("a") < 1.0)
    assert(r8("a") > 0.86) // fixed point 1.0; error = 0.5·0.85^k → 0.136 at k=8
  }

  test("star graph: the hub outranks the leaves; leaves identical") {
    val edges = (1 to 6).map(i => ("hub", s"leaf$i"))
    val r = ranksOf(edges, 5)
    val leaves = (1 to 6).map(i => r(s"leaf$i"))
    assert(leaves.distinct.size == 1)
    assert(r("hub") > leaves.head * 2,
      s"hub ${r("hub")} not dominant over ${leaves.head}")
  }

  test("ranks are partition-layout independent (decimal superstep sums)") {
    // a messier graph: chain + chords
    val edges = (1 to 40).map(i => (s"n$i", s"n${i + 1}")) ++
      (1 to 40 by 7).map(i => (s"n$i", s"n${math.min(i + 13, 41)}"))
    val a = ranksOf(edges, 5, parts = 1)
    val b = ranksOf(edges, 5, parts = 7)
    assert(a == b, "ranks changed under re-partitioning")
  }

  test("ranks are identical with the broadcast hint gated off (shuffle-join fallback)") {
    import spark.implicits._
    val edges = ((1 to 40).map(i => (s"n$i", s"n${i + 1}")) ++
      (1 to 40 by 7).map(i => (s"n$i", s"n${math.min(i + 13, 41)}"))).toDF("src", "dst")
    val hinted = Graph.pageRank(edges, 4)
      .as[(String, Double)].collect().toMap
    // maxBroadcastNodes = 0 forces the over-the-ceiling path: the
    // superstep join runs without the forced hint (planner's choice —
    // the web-graph shape where ranks no longer fit one executor)
    val fallback = Graph.pageRank(edges, 4, maxBroadcastNodes = 0L)
      .as[(String, Double)].collect().toMap
    assert(hinted == fallback, "gating the broadcast hint changed ranks")
  }

  private def triOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.ops.Graph.triangleCounts(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangleCounts: closed forms — K4, path, star") {
    // K4: C(3,2)=3 triangles per node, 4 triangles total (sum 12)
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(triOf(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // path and star: triangle-free → empty output
    assert(triOf(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    assert(triOf((1L to 6L).map(i => (0L, i))).isEmpty)
  }

  test("triangleCounts equals the naive x<y<z enumeration on a random hub-heavy graph") {
    val rnd = new scala.util.Random(7)
    // hub-heavy: node 0 connects widely (the Σdeg² blowup case the
    // degree orientation exists for) plus random chords
    val edges = ((1L to 25L).map(i => (0L, i)) ++
      List.fill(120)((rnd.nextInt(26).toLong, rnd.nextInt(26).toLong)))
      .filter { case (u, v) => u != v }
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .distinct
    val es = edges.toSet
    val naive = (for {
      (x, y) <- edges; (y2, z) <- edges
      if y2 == y && es.contains((x, z))
    } yield Seq(x, y, z)).flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(triOf(edges) == naive)
    assert(naive.nonEmpty, "fixture has no triangles — vacuous")
  }
}
