package graft

import graft.harness.GraphQueries

/** Structural invariants the value-hash oracle can't state:
  * PageRank's total mass is conserved (teleport + damped inflow sums
  * to 1 when no node dangles — the symmetric closure guarantees
  * out-edges everywhere), and every triangle membership count is
  * positive and divisible by nothing weirder than its own definition.
  */
class GraphQueriesSpec extends SparkSpec {

  test("graph_pagerank conserves rank mass (no dangling nodes)") {
    val rows = GraphQueries.queries("graph_pagerank")(spark, sf)
      .collect().map(_.getDouble(1))
    assert(rows.length > 0)
    val total = rows.sum
    // 9dp per-node rounding over ~200 nodes bounds the drift
    assert(math.abs(total - 1.0) < 1e-5, s"rank mass $total drifted from 1")
    rows.foreach(r => assert(r > 0.0, "a rank went non-positive"))
  }

  test("graph_triangles members each sit in at least one triangle") {
    val rows = GraphQueries.queries("graph_triangles")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n) => assert(n >= 1L) }
  }
}
