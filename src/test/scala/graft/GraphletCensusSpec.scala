package graft

import graft.graph.{Graph, GraphBuilder, GraphQueries}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the closed-form induced 4-node graphlet census against a
  * brute-force classifier that enumerates every C(n,4) vertex subset
  * and classifies its induced subgraph by degree sequence + edge
  * count — the definition itself, feasible only on spec-sized graphs.
  */
class GraphletCensusSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Induced counts by brute force: (path4, claw, cycle4, paw,
    * diamond, clique4). */
  private def brute(n: Int, edges: Set[(Long, Long)]): Map[String, Long] = {
    val adj = (e: Long, f: Long) =>
      edges.contains((e, f)) || edges.contains((f, e))
    val counts = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val vs = (1L to n.toLong).toArray
    for {
      i <- vs.indices; j <- (i + 1) until vs.length
      k <- (j + 1) until vs.length; l <- (k + 1) until vs.length
    } {
      val q = Array(vs(i), vs(j), vs(k), vs(l))
      val pairs = for {
        a <- 0 until 4; b <- (a + 1) until 4 if adj(q(a), q(b))
      } yield (a, b)
      val m = pairs.size
      val deg = Array.fill(4)(0)
      pairs.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
      val ds = deg.sorted.toSeq
      // connected 4-vertex induced types by (m, degree sequence)
      val key = (m, ds) match {
        case (3, Seq(1, 1, 2, 2)) => "1_path4"
        case (3, Seq(1, 1, 1, 3)) => "2_claw"
        case (4, Seq(2, 2, 2, 2)) => "3_cycle4"
        case (4, Seq(1, 2, 2, 3)) => "4_paw"
        case (5, _)               => "5_diamond"
        case (6, _)               => "6_clique4"
        case _                    => "" // disconnected or <4-vertex support
      }
      if (key.nonEmpty) counts(key) += 1L
    }
    Seq("1_path4", "2_claw", "3_cycle4", "4_paw", "5_diamond", "6_clique4")
      .map(k => k -> counts(k)).toMap
  }

  private def censusOf(n: Int, edges: Set[(Long, Long)]): Map[String, Long] = {
    val e = edges.toSeq.sorted.toDF("src", "dst")
    val v = (1L to n.toLong).toDF("id")
    GraphQueries.graphletCensusOf(Graph(v, e))
      .as[(String, Long)].collect().toMap
  }

  test("census == brute force on the six prototype graphlets") {
    // each prototype alone must count itself exactly once
    val protos = Seq(
      Set((1L, 2L), (2L, 3L), (3L, 4L)),                              // path
      Set((1L, 2L), (1L, 3L), (1L, 4L)),                              // claw
      Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)),                    // cycle
      Set((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)),                    // paw
      Set((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (2L, 4L)),          // diamond
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))) // K4
    protos.foreach { es =>
      val b = brute(4, es)
      assert(censusOf(4, es) == b, s"edges=$es")
      assert(b.values.sum == 1L, s"prototype must classify once: $es")
    }
  }

  test("census == brute force on a seeded random graph") {
    // 14 vertices, p≈0.3 via a deterministic LCG — dense enough that
    // every graphlet type appears; 1001 subsets brute-classified
    var state = 42L
    def nextBit(): Boolean = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 33) % 10) < 3
    }
    val edges = (for {
      a <- 1L to 14L; b <- (a + 1) to 14L if nextBit()
    } yield (a, b)).toSet
    val expected = brute(14, edges)
    assert(expected.count(_._2 > 0) >= 5, s"want coverage, got $expected")
    assert(censusOf(14, edges) == expected)
  }

  test("census over the co-purchase graph is consistent with its primitives") {
    val c = GraphQueries.graphletCensus(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(c.size == 6)
    assert(c.values.forall(_ >= 0L), s"induced counts must be >= 0: $c")
    // the co-purchase construction (orders become cliques) forces a
    // K4-heavy census
    assert(c("6_clique4") > 0)
  }
}
