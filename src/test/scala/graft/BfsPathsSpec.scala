package graft

import graft.graph.{Graph, GraphBuilder, Gx, Iterative}
import org.scalatest.funsuite.AnyFunSuite

/** Path-returning BFS: known-answer toy graph + structural validation
  * (every returned path is a real shortest path under the min-parent
  * rule) on the real co-purchase graph.
  */
class BfsPathsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("min-parent canonical path on a diamond graph") {
    // 1-2, 1-3, 2-4, 3-4: two shortest paths 1->2->4 and 1->3->4;
    // min-parent must pick 2.
    val e = Seq[(Long, Long)]((1, 2), (1, 3), (2, 4), (3, 4)).toDF("src", "dst")
    val g = Graph(GraphBuilder.vertices(e), e)
    val dists = Gx.multiSourceBfs(g, Seq(1L))
    val got = Iterative.bfsPaths(g, dists, source = 1L, k = 10)
      .as[(Long, Int, String)].collect()
      .map { case (v, d, p) => v -> (d, p) }.toMap
    assert(got(4L) == (2, "1->2->4"))
    assert(got(2L) == (1, "1->2"))
    assert(got(3L) == (1, "1->3"))
  }

  test("paths on the real graph are valid min-parent shortest paths") {
    val g = GraphBuilder.coPurchase(spark, sf)
    val src = Iterative.topDegreeLandmarks(g, 1).head().getLong(0)
    val dists = GraphBuilder.landmarkBfs(g, 8)
    val paths = Iterative.bfsPaths(g, dists, src, k = 10)
      .as[(Long, Int, String)].collect()
    assert(paths.length == 10)
    val edgeSet = g.edges.as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val dist = dists.filter($"landmark" === src)
      .select("v", "dist").as[(Long, Int)].collect().toMap
    paths.foreach { case (v, d, p) =>
      val hops = p.split("->").map(_.toLong)
      assert(hops.head == src && hops.last == v, p)
      assert(hops.length == d + 1, s"$p length vs dist $d")
      hops.sliding(2).foreach { case Array(a, b) =>
        assert(edgeSet((a, b)), s"non-edge $a-$b in $p")
      }
      // each hop must sit exactly on the BFS level and be the MIN such
      // neighbor (canonical parent rule)
      hops.zipWithIndex.foreach { case (h, i) => assert(dist(h) == i, p) }
      hops.sliding(2).zipWithIndex.foreach { case (Array(a, b), i) =>
        val minParent = edgeSet.collect {
          case (x, y) if y == b && dist.get(x).contains(i) => x
        }.min
        assert(a == minParent, s"hop $a->$b not min-parent in $p")
      }
    }
  }
}
