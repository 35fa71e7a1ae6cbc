package graft

import graft.graph.Scc
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** SCC correctness: known-answer toy graphs + a full cross-check of the
  * distributed FW-BW coloring against an in-memory Tarjan on the real
  * directed purchase-sequence graph at sf0.001.
  */
class SccSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Iterative Tarjan, labels = min member id (canonical). */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val out = mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    val verts = mutable.Set.empty[Long]
    edges.foreach { case (s, d) =>
      out(s) = d :: out(s); verts += s; verts += d
    }
    val index = mutable.Map.empty[Long, Int]
    val low = mutable.Map.empty[Long, Int]
    val onStack = mutable.Set.empty[Long]
    val stack = mutable.Stack.empty[Long]
    val result = mutable.Map.empty[Long, Long]
    var counter = 0
    for (v0 <- verts if !index.contains(v0)) {
      // explicit work stack: (vertex, remaining successors)
      val work = mutable.Stack[(Long, List[Long])]((v0, out(v0)))
      index(v0) = counter; low(v0) = counter; counter += 1
      stack.push(v0); onStack += v0
      while (work.nonEmpty) {
        val (v, succs) = work.pop()
        succs match {
          case w :: rest =>
            work.push((v, rest))
            if (!index.contains(w)) {
              index(w) = counter; low(w) = counter; counter += 1
              stack.push(w); onStack += w
              work.push((w, out(w)))
            } else if (onStack(w)) low(v) = math.min(low(v), index(w))
          case Nil =>
            if (low(v) == index(v)) {
              val comp = mutable.Buffer.empty[Long]
              var w = 0L
              do { w = stack.pop(); onStack -= w; comp += w } while (w != v)
              val m = comp.min
              comp.foreach(result(_) = m)
            }
            if (work.nonEmpty) {
              val (p, _) = work.top
              low(p) = math.min(low(p), low(v))
            }
        }
      }
    }
    result.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Scc.stronglyConnectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("two cycles joined by a bridge, plus a tail") {
    // {1,2,3} -> {4,5} -> 6
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6))
    assert(run(edges) == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("pure DAG: every vertex is its own SCC") {
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (2, 4), (3, 4), (4, 5))
    assert(run(edges) == Map(
      1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("one big cycle: a single SCC labeled by its min vertex") {
    val n = 20L
    val edges = (1L until n).map(i => (i, i + 1)) :+ (n, 1L)
    val got = run(edges)
    assert(got.size == n.toInt && got.values.forall(_ == 1L))
  }

  test("chain INTO a cycle and OUT of it (trim + peel interplay)") {
    // 10->11->1, cycle {1,2,3}, 3->12->13
    val edges = Seq[(Long, Long)](
      (10, 11), (11, 1), (1, 2), (2, 3), (3, 1), (3, 12), (12, 13))
    val got = run(edges)
    assert(got == Map(10L -> 10L, 11L -> 11L, 1L -> 1L, 2L -> 1L,
      3L -> 1L, 12L -> 12L, 13L -> 13L))
  }

  test("reciprocity equals brute force on the real directed graph") {
    val e = Scc.lineSequenceEdges(spark, sf).as[(Long, Long)].collect().toSet
    val want = e.count { case (s, d) => e.contains((d, s)) }
    val row = graft.graph.GraphQueries.reciprocity(spark, sf).head()
    assert(row.getAs[Long]("n_edges") == e.size)
    assert(row.getAs[Long]("n_reciprocal") == want)
    assert(math.abs(row.getAs[Double]("reciprocity") -
      math.rint(want.toDouble / e.size * 1e6) / 1e6) < 1e-9)
  }

  test("FW-BW coloring == Tarjan on the real sf graph") {
    val edgeDf = Scc.lineSequenceEdges(spark, sf)
    val edges = edgeDf.as[(Long, Long)].collect().toSeq
    val expected = tarjan(edges)
    val got = run(edges)
    assert(got.size == expected.size)
    val bad = got.collect { case (v, s) if expected(v) != s => (v, s, expected(v)) }
    assert(bad.isEmpty, s"first mismatches: ${bad.take(5)}")
  }
}
