package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forces the >500k-vertex fallback branches — the plans a 100 TB
  * graph would actually run — on REAL data and pins them equal to the
  * broadcast branches (VERDICT r8 "Next #3": these paths had never
  * executed outside toy specs because every test graph broadcasts).
  *
  * `Graph.broadcastVertexGate` is dropped to 0 so the sf0.001
  * co-purchase graph routes through: the square-count WIDE wedge-
  * stream plan (row exchange + pre-partitioned aggregate), the
  * clique4 SHUFFLE-join (no adjacency broadcast), the shuffle-join
  * oriented/intersection pipeline under both, and the no-broadcast
  * triangle-estimate plan. Fresh Graph instances per side so the
  * lazy-val caches can't leak plans across gate settings; tests run
  * sequentially in the forked test JVM, so the var flip is safe. */
class FallbackGateSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.graph.{Graph, GraphBuilder, GraphQueries}

  private def freshGraph(): Graph = {
    val g = GraphBuilder.coPurchase(spark, sf)
    Graph(g.vertices, g.edges)
  }

  private def withGate[A](gate: Long)(f: => A): A = {
    val old = Graph.broadcastVertexGate
    Graph.broadcastVertexGate = gate
    try f finally Graph.broadcastVertexGate = old
  }

  test("square count: wide wedge-stream plan equals broadcast-merge kernel") {
    val small = withGate(Long.MaxValue) {
      freshGraph().squareCountPlan.head().getLong(0)
    }
    val wide = withGate(0L) {
      freshGraph().squareCountPlan.head().getLong(0)
    }
    assert(small == wide, s"square count diverges: $small vs $wide")
    assert(small > 0L, "degenerate graph: no squares")
  }

  test("clique4: shuffle-join plan equals broadcast plan") {
    val small = withGate(Long.MaxValue) {
      freshGraph().clique4Plan.head().getLong(0)
    }
    val wide = withGate(0L) {
      freshGraph().clique4Plan.head().getLong(0)
    }
    assert(small == wide, s"clique4 diverges: $small vs $wide")
    assert(small > 0L, "degenerate graph: no 4-cliques")
  }

  test("triangle estimate: no-broadcast plan equals broadcast plan") {
    def run() = GraphQueries.triangleEstimateOn(freshGraph(), 4, 42L)
      .collect().map(_.toSeq.toList).toList
    val small = withGate(Long.MaxValue)(run())
    val wide = withGate(0L)(run())
    assert(small == wide, s"estimate diverges: $small vs $wide")
  }

  test("edge common stats: shuffle-join degrees equal broadcast degrees") {
    def run(): Map[(Long, Long), (Long, Double)] =
      freshGraph().edgeCommonStats.collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), math.rint(r.getDouble(3) * 1e9) / 1e9)).toMap
    val small = withGate(Long.MaxValue)(run())
    val wide = withGate(0L)(run())
    assert(small == wide)
    assert(small.nonEmpty)
  }

  test("coreNumbers twin: shuffle-join state branch equals broadcast branch") {
    def run(): Map[Long, Long] =
      graft.graph.Metrics.coreNumbers(freshGraph(), maxIter = 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val small = withGate(Long.MaxValue)(run())
    val wide = withGate(0L)(run())
    assert(small == wide, "core numbers diverge between join branches")
    assert(small.values.max > 1L, "degenerate graph: max coreness <= 1")
  }
}
