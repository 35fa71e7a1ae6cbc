package graft

import graft.graph.{Graph, GraphBuilder, GraphQueries, Metrics}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // triangle {1,2,3} + pendant 4 on vertex 3
  lazy val triPendant = {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    Graph(GraphBuilder.vertices(e), e)
  }

  test("density of triangle+pendant") {
    // 4 vertices, 4 edges: 2*4/(4*3) = 2/3
    val d = Metrics.density(triPendant).as[Double].head()
    assert(math.abs(d - 2.0 / 3.0) < 1e-6)
  }

  test("neighborJaccard on known graph") {
    val j = Metrics.neighborJaccard(triPendant)
      .select($"src", $"dst", $"jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (s, d, v) => (s, d) -> v }.toMap
    // edge (1,2): N(1)={2,3}, N(2)={1,3} → common {3}, union {1,2,3} → 1/3
    assert(math.abs(j((1L, 2L)) - 1.0 / 3.0) < 1e-4)
    // edge (3,4): N(3)={1,2,4}, N(4)={3} → common ∅ → 0
    assert(j((3L, 4L)) == 0.0)
  }

  test("kCore peels pendant vertices") {
    val core2 = Metrics.kCore(triPendant, k = 2)
      .select("id").as[Long].collect().toSet
    assert(core2 == Set(1L, 2L, 3L)) // pendant 4 peeled, triangle stays
    val core3 = Metrics.kCore(triPendant, k = 3)
      .select("id").as[Long].collect().toSet
    assert(core3.isEmpty) // triangle has degree 2 internally
  }

  test("coreNumbers: known coreness on triangle+pendant and K4+tail") {
    val got = Metrics.coreNumbers(triPendant)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 1), got.toString)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val g = Graph(GraphBuilder.vertices(e), e)
    val k4 = Metrics.coreNumbers(g).as[(Long, Long)].collect().toMap
    assert(k4 == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3, 5L -> 1, 6L -> 1),
      k4.toString)
  }

  test("coreNumbers consistent with kCore membership at sf") {
    val g = GraphBuilder.coPurchase(spark, sf)
    val core4 = Metrics.kCore(g, k = 4).select("id")
      .as[Long].collect().toSet
    val byCore = Metrics.coreNumbers(g).as[(Long, Long)].collect()
    val wantIn = byCore.filter(_._2 >= 4).map(_._1).toSet
    assert(wantIn == core4, s"${wantIn.size} vs ${core4.size}")
  }

  test("graph summary row equals the individual metric queries") {
    val s = graft.graph.GraphQueries.summary(spark, sf).head()
    val g = GraphBuilder.coPurchase(spark, sf)
    assert(s.getAs[Long]("n_vertices") == g.vertices.count())
    assert(s.getAs[Long]("n_edges") == g.edges.count())
    val avgDeg = graft.graph.GraphQueries.avgDegree(spark, sf)
      .head().getDouble(0)
    assert(s.getAs[Double]("avg_degree") == avgDeg)
    val clus = graft.graph.GraphQueries.avgClustering(spark, sf)
      .head().getDouble(0)
    assert(s.getAs[Double]("avg_clustering") == clus)
    val comps = graft.graph.Gx.connectedComponents(g)
      .select("component").distinct().count()
    assert(s.getAs[Long]("n_components") == comps)
  }

  test("Gx delta-Pregel coreness == DataFrame h-index twin") {
    val g = GraphBuilder.coPurchase(spark, sf)
    val gx = graft.graph.Gx.coreNumbers(g)
      .as[(Long, Long)].collect().toMap
    val df = Metrics.coreNumbers(g).as[(Long, Long)].collect().toMap
    assert(gx == df)
    // and on the known small graphs
    val small = Metrics.coreNumbers(triPendant).as[(Long, Long)].collect().toMap
    val smallGx = graft.graph.Gx.coreNumbers(triPendant)
      .as[(Long, Long)].collect().toMap
    assert(smallGx == small)
  }

  test("Gx coreness == peeling oracle on seeded random graphs") {
    // Local min-degree peeling is the definitional core decomposition —
    // independent of BOTH the h-index twins. Pins the round-7 bounded
    // count-vector message shape to the definition.
    def peelCoreness(edges: Seq[(Long, Long)]): Map[Long, Int] = {
      val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
      edges.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
      }
      val core = scala.collection.mutable.Map.empty[Long, Int]
      var k = 0
      while (adj.nonEmpty) {
        var peeled = true
        while (peeled) {
          peeled = false
          adj.keys.toSeq.foreach { v =>
            if (adj.contains(v) && adj(v).size <= k) {
              core(v) = k
              adj(v).foreach(u => adj.get(u).foreach(_ -= v))
              adj -= v
              peeled = true
            }
          }
        }
        k += 1
      }
      core.toMap
    }
    for (seed <- Seq(7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val raw = (1 to 400).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val e = raw.toDF("src", "dst")
      val g = Graph(GraphBuilder.vertices(e), e)
      val want = peelCoreness(raw)
      val gx = graft.graph.Gx.coreNumbers(g)
        .as[(Long, Long)].collect().map { case (id, c) => id -> c.toInt }.toMap
      assert(gx == want, s"seed=$seed: ${gx.toSeq.sorted.take(5)} vs ${want.toSeq.sorted.take(5)}")
      val df = Metrics.coreNumbers(g)
        .as[(Long, Long)].collect().map { case (id, c) => id -> c.toInt }.toMap
      assert(df == want, s"seed=$seed DF twin")
    }
  }

  test("kTruss keeps a clique, drops pendants and weakly-attached triangles") {
    // K4 {1,2,3,4} + vertex 5 forming triangle {1,2,5} + pendant 6 on 1
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (2L, 5L), (1L, 6L)).toDF("src", "dst")
    val g = Graph(GraphBuilder.vertices(e), e)
    // k=4: edges (1,5),(2,5) have support 1 → pruned round 1; K4 edges
    // then re-evaluate to support 2 within survivors → all kept
    val t4 = Metrics.kTruss(g, k = 4)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(t4.map(r => (r._1, r._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(t4.forall(_._3 == 2), t4.mkString(","))
    // k=5 needs support ≥ 3: K4 cannot provide it → empty truss
    assert(Metrics.kTruss(g, k = 5).count() == 0)
    // k=3 keeps every triangle edge, drops only the pendant
    val t3 = Metrics.kTruss(g, k = 3)
      .select($"src", $"dst").as[(Long, Long)].collect().toSet
    assert(t3 == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (2L, 5L)))
  }

  test("kTruss peel cascades: removing the bridge collapses the chain") {
    // two triangles sharing edge (2,3): {1,2,3} and {2,3,4}
    // k=4: every edge has support ≤ 2; (2,3) has support 2, others 1 →
    // round 1 drops the side edges, then (2,3) has support 0 → empty
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val g = Graph(GraphBuilder.vertices(e), e)
    assert(Metrics.kTruss(g, k = 4).count() == 0)
    // k=3 keeps everything (each edge closes ≥1 triangle)
    assert(Metrics.kTruss(g, k = 3).count() == 5)
  }

  test("modularity of the trivial one-community partition is near zero") {
    val labels = triPendant.vertices.select($"id", lit(0).as("community"))
    val q = Metrics.modularity(triPendant, labels).as[Double].head()
    // single community: e_c/m = 1, (d_c/2m)^2 = 1 → Q = 0
    assert(math.abs(q) < 1e-6)
  }

  test("modularity prefers the natural split on two cliques") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L),
      (3L, 10L)).toDF("src", "dst")
    val g = Graph(GraphBuilder.vertices(e), e)
    val good = g.vertices.select($"id",
      when($"id" < 10, 0).otherwise(1).as("community"))
    val bad = g.vertices.select($"id", (pmod($"id", lit(2))).cast("int").as("community"))
    val qGood = Metrics.modularity(g, good).as[Double].head()
    val qBad = Metrics.modularity(g, bad).as[Double].head()
    assert(qGood > qBad && qGood > 0.3)
  }

  test("componentSizes on two components") {
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val g = Graph(GraphBuilder.vertices(e), e)
    val sizes = Metrics.componentSizes(g).as[(Long, Long)].collect().toMap
    assert(sizes == Map(3L -> 1L, 2L -> 1L))
  }

  test("assortativity is defined and in [-1,1] on the co-purchase graph") {
    val a = Metrics.degreeAssortativity(GraphBuilder.coPurchase(spark, sf))
      .as[Double].head()
    assert(a >= -1.0 && a <= 1.0)
  }

  test("weakest ties: bridges flagged, ordered by common count, top-k") {
    // path 1-2-3 into triangle 4-5-6: the three path/attach edges are
    // true local bridges (no common neighbor); triangle edges share one
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val g = Graph(GraphBuilder.vertices(e), e)
    val r = Metrics.localBridges(g, k = 10).collect()
    assert(r.length == 6)
    val bridges = r.filter(_.getAs[Int]("is_bridge") == 1)
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(bridges == Set((1L, 2L), (2L, 3L), (3L, 4L)))
    // ordering: all bridges (common 0) precede triangle edges (common 1)
    assert(r.map(_.getAs[Long]("common_cnt")).toSeq == Seq(0L, 0L, 0L, 1L, 1L, 1L))
  }

  test("link prediction: non-adjacent pairs only, AA verified, deterministic") {
    val r = GraphQueries.linkPrediction(spark, sf, k = 20).cache()
    val rows = r.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // no suggested pair is an existing edge
    val g = GraphBuilder.coPurchase(spark, sf)
    assert(r.join(g.edges, Seq("src", "dst"), "left_semi").count() == 0)
    // spot-verify the top pair's AA score from first principles:
    // common neighbors WITHIN the sampled subgraph, full-graph degrees
    val deg = g.degrees.as[(Long, Long)].collect().toMap
    val adj: Map[Long, Set[Long]] = g.symmetrized.as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => (k2, v.map(_._2).toSet) }.toMap
    val keep = Tables(spark, sf).part.filter($"p_size" <= 10)
      .select($"p_partkey").as[Long].collect().toSet
    val top = rows.head
    val (s, d) = (top.getLong(0), top.getLong(1))
    val common = adj(s).intersect(adj(d)).intersect(keep)
    assert(top.getLong(2) == common.size)
    val aa = common.toSeq.map(w => 1.0 / math.log(deg(w))).sum
    assert(math.abs(top.getDouble(3) - aa) < 1e-5)
    // deterministic top-k
    assert(GraphQueries.linkPrediction(spark, sf, k = 20).collect()
      .sameElements(rows))
  }
}
