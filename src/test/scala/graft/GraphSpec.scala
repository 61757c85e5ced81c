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
}
