package graft

import graft.graph.{Graph, GraphBuilder, Gx, Iterative}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GraphX-backed implementations (Gx) must produce EXACTLY the same
  * results as the independent DataFrame implementations (Iterative) —
  * same init, same update rule, same deterministic tie-breaks. These
  * specs pin that equivalence on both toy graphs and the real
  * co-purchase graph, so the production path (Gx) inherits the oracle
  * evidence gathered for the DF path and vice versa.
  */
class GxSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val g = GraphBuilder.coPurchase(spark, sf)

  test("Gx connected components == DataFrame large/small-star components") {
    val ours = Gx.connectedComponents(g).as[(Long, Long)].collect().toMap
    val dfImpl = Iterative.connectedComponents(g).as[(Long, Long)].collect().toMap
    assert(ours == dfImpl)
  }

  test("weighted pagerank with unit weights == unweighted pagerank") {
    val unit = g.edges.select($"src", $"dst").withColumn("weight", lit(1L))
    val wpr = Gx.weightedPageRank(unit).as[(Long, Double)].collect().toMap
    val pr = Gx.pageRank(g, iters = 10).as[(Long, Double)].collect().toMap
    assert(wpr.keySet == pr.keySet)
    wpr.foreach { case (id, r) =>
      assert(math.abs(r - pr(id)) <= 1e-6, s"vertex $id: $r vs ${pr(id)}")
    }
  }

  test("weighted sssp: two-hop route beats the heavy direct edge") {
    // triangle 1-2 (10), 1-3 (2), 3-2 (3): dist(2) = 5 via 3, not 10;
    // vertex 4 rides a pendant edge; 5-6 is a separate component
    val we = Seq((1L, 2L, 10L), (1L, 3L, 2L), (2L, 3L, 3L), (2L, 4L, 1L),
      (5L, 6L, 7L)).toDF("src", "dst", "weight")
    val got = Gx.weightedSssp(we, source = 1L).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 2L, 4L -> 6L))
  }

  test("weighted sssp with unit weights == hop distances from the landmark") {
    val unit = g.edges.select($"src", $"dst").withColumn("weight", lit(1L))
    val src = Iterative.topDegreeLandmarks(g, 1).collect().head.getLong(0)
    val got = Gx.weightedSssp(unit, src).as[(Long, Long)].collect().toMap
    val bfs = Gx.multiSourceBfs(g, Seq(src))
      .select($"v", $"dist".cast("long")).as[(Long, Long)].collect().toMap
    assert(got == bfs)
  }

  test("weighted pagerank shifts rank toward heavy edges (hand-checked)") {
    // path 1 —(10)— 2 —(1)— 3: from 2, mass flows 10/11 to 1, 1/11 to 3
    val we = Seq((1L, 2L, 10L), (2L, 3L, 1L)).toDF("src", "dst", "weight")
    val got = Gx.weightedPageRank(we).as[(Long, Double)].collect().toMap
    // replay the same fixed-iteration update locally
    var r = Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0)
    for (_ <- 1 to 10) {
      r = Map(
        1L -> (0.15 + 0.85 * r(2L) * 10.0 / 11.0),
        2L -> (0.15 + 0.85 * (r(1L) * 10.0 / 10.0 + r(3L) * 1.0 / 1.0)),
        3L -> (0.15 + 0.85 * r(2L) * 1.0 / 11.0))
    }
    r.foreach { case (id, want) =>
      assert(math.abs(got(id) - want) < 1e-9, s"vertex $id: ${got(id)} vs $want")
    }
    assert(got(1L) > got(3L), "heavy edge must attract more rank")
  }

  test("Gx pagerank == DataFrame pagerank (same fixed-point iteration)") {
    val ours = Gx.pageRank(g, iters = 10).as[(Long, Double)].collect().toMap
    val dfImpl = Iterative.pageRank(g, iters = 10)
      .as[(Long, Double)].collect().toMap
    assert(ours.keySet == dfImpl.keySet)
    // identical math; only float summation order differs (both round
    // to 6 decimals, so allow the last digit to wobble)
    ours.foreach { case (id, r) =>
      assert(math.abs(r - dfImpl(id)) <= 1e-6, s"vertex $id: $r vs ${dfImpl(id)}")
    }
  }

  test("pageRank(tol): converges, agrees with a long fixed-iteration run") {
    // tight tol → the convergence-mode ranks must match a fixed run
    // that is certainly past that tolerance (50 iters; 0.85^50 ≈ 3e-4
    // of the initial residual, and empirically max|Δ| < 1e-9 by then)
    val conv = Gx.pageRankTol(g, tol = 1e-8, maxIter = 200)
      .as[(Long, Double)].collect().toMap
    val fixed = Gx.pageRank(g, iters = 50).as[(Long, Double)].collect().toMap
    assert(conv.keySet == fixed.keySet)
    conv.foreach { case (id, r) =>
      assert(math.abs(r - fixed(id)) <= 1e-5, s"vertex $id: $r vs ${fixed(id)}")
    }
    // loose tol stops EARLY: ranks differ from the converged fixpoint
    // by more than the tight-tol run does (proves the loop actually
    // keys off the tolerance rather than running to the cap)
    val loose = Gx.pageRankTol(g, tol = 0.5, maxIter = 200)
      .as[(Long, Double)].collect().toMap
    val errLoose = loose.map { case (id, r) => math.abs(r - fixed(id)) }.max
    val errTight = conv.map { case (id, r) => math.abs(r - fixed(id)) }.max
    assert(errLoose > errTight,
      s"loose tol should stop earlier (errs: $errLoose vs $errTight)")
  }

  test("Gx personalized pagerank == DataFrame ppr") {
    val src = Iterative.topDegreeLandmarks(g, 1).head().getLong(0)
    val ours = Gx.personalizedPageRank(g, src).as[(Long, Double)].collect().toMap
    val dfImpl = Iterative.personalizedPageRank(g, src)
      .as[(Long, Double)].collect().toMap
    assert(ours.keySet == dfImpl.keySet)
    ours.foreach { case (id, r) =>
      assert(math.abs(r - dfImpl(id)) <= 1e-6, s"vertex $id: $r vs ${dfImpl(id)}")
    }
  }

  test("Gx multi-source BFS == DataFrame frontier BFS") {
    val landmarks = Iterative.topDegreeLandmarks(g, 4)
      .collect().map(_.getLong(0)).toSeq
    val ours = Gx.multiSourceBfs(g, landmarks)
      .as[(Long, Long, Int)].collect().toSet
    val dfImpl = Iterative.multiSourceBfs(g, landmarks.toDF("id"))
      .as[(Long, Long, Int)].collect().toSet
    assert(ours == dfImpl)
  }

  test("Gx label propagation == DataFrame LPA (deterministic tie-break)") {
    val ours = Gx.labelPropagation(g, iters = 5)
      .as[(Long, Long)].collect().toMap
    val dfImpl = Iterative.labelPropagation(g, maxIter = 5)
      .as[(Long, Long)].collect().toMap
    assert(ours == dfImpl)
  }

  test("exact eccentricities/diameter/closeness == brute-force BFS") {
    // local queue-BFS oracle over an adjacency map
    def bfsFrom(adj: Map[Long, Seq[Long]], s: Long): Map[Long, Int] = {
      val dist = scala.collection.mutable.Map(s -> 0)
      val q = scala.collection.mutable.Queue(s)
      while (q.nonEmpty) {
        val u = q.dequeue()
        adj.getOrElse(u, Nil).foreach { v =>
          if (!dist.contains(v)) { dist(v) = dist(u) + 1; q.enqueue(v) }
        }
      }
      dist.toMap
    }
    def check(edges: Seq[(Long, Long)], batchSize: Int): Unit = {
      val e = edges.toDF("src", "dst")
      val gg = Graph(GraphBuilder.vertices(e), e)
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2) }
      val ids = adj.keys.toSeq
      val all = ids.map(s => s -> bfsFrom(adj, s)).toMap
      val wantEcc = ids.map(s => s -> all(s).values.max.toLong).toMap
      val gotEcc = Gx.exactEccentricities(gg, batchSize)
        .as[(Long, Long)].collect().toMap
      assert(gotEcc == wantEcc, s"ecc mismatch (batch=$batchSize)")
      val wantDiam = wantEcc.values.max
      assert(Gx.exactDiameter(gg, batchSize).head().getLong(0) == wantDiam)
      val gotClose = Gx.exactCloseness(gg, batchSize)
        .as[(Long, Double)].collect().toMap
      ids.filter(s => all(s).size > 1).foreach { s =>
        val sum = all(s).values.sum
        val want = (all(s).size - 1).toDouble / sum
        assert(math.abs(gotClose(s) - want) < 1e-5,
          s"closeness($s): ${gotClose(s)} vs $want")
      }
    }
    // K4 (ecc all 1), path P5 (ecc 4,3,2,3,4), star (center 1, leaves 2),
    // plus a disconnected pair — batch width 2 exercises the slicing
    check(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)), 2)
    check(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 2)
    check(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L)), 3)
    // the real sf0.001 co-purchase graph against the same local oracle
    val realEdges = g.edges.as[(Long, Long)].collect().toSeq
    check(realEdges, 512)
    // and the landmark estimate is a lower bound of the exact diameter
    val est = Gx.diameterEstimate(g).head().getInt(0)
    val exact = {
      val e = realEdges.toDF("src", "dst")
      val gg = Graph(GraphBuilder.vertices(e), e)
      Gx.exactDiameter(gg).head().getLong(0)
    }
    assert(est <= exact, s"double-sweep $est must lower-bound exact $exact")
  }

  test("Gx diameter estimate == DataFrame double sweep") {
    val ours = Gx.diameterEstimate(g).head().getInt(0)
    val dfImpl = Iterative.diameterEstimate(g).head().getInt(0)
    assert(ours == dfImpl)
  }

  test("Gx betweenness == DataFrame Brandes (same seeded uniform sources)") {
    val ours = graph.GxBetweenness.run(g, numSources = 4)
      .as[(Long, Double)].collect().toMap
    val dfImpl = graph.Betweenness.run(g, numSources = 4)
      .as[(Long, Double)].collect().toMap
    assert(ours.keySet == dfImpl.keySet)
    ours.foreach { case (id, b) =>
      assert(math.abs(b - dfImpl(id)) <= 1e-5, s"vertex $id: $b vs ${dfImpl(id)}")
    }
  }

  test("exact betweenness == brute-force Brandes on asymmetric graphs") {
    // driver-side reference: textbook Brandes, one BFS per source,
    // backward dependency accumulation, undirected pairs counted once
    def brute(edges: Seq[(Long, Long)]): Map[Long, Double] = {
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val nodes = adj.keySet.toSeq.sorted
      val bc = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      for (s <- nodes) {
        val dist = scala.collection.mutable.Map(s -> 0)
        val sigma = scala.collection.mutable.Map(s -> 1.0)
          .withDefaultValue(0.0)
        val order = scala.collection.mutable.ArrayBuffer[Long]()
        val queue = scala.collection.mutable.Queue(s)
        while (queue.nonEmpty) {
          val v = queue.dequeue(); order += v
          for (w <- adj(v).toSeq.sorted) {
            if (!dist.contains(w)) { dist(w) = dist(v) + 1; queue += w }
            if (dist(w) == dist(v) + 1) sigma(w) += sigma(v)
          }
        }
        val delta = scala.collection.mutable.Map[Long, Double]()
          .withDefaultValue(0.0)
        for (w <- order.reverse; v <- adj(w) if dist.contains(v) &&
            dist(v) == dist(w) - 1) {
          delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
        }
        for (v <- nodes if v != s) bc(v) += delta(v)
      }
      nodes.map(v => v -> bc(v) / 2.0).toMap
    }
    // kite + tail: no symmetry, mixed degrees — the case sampling gets
    // wrong and exact must not
    val kite = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    // K4 plus pendant: hub vs clique distinction
    val k4p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    for (edges <- Seq(kite, k4p)) {
      val e = edges.toDF("src", "dst")
      val gr = graph.Graph(graph.GraphBuilder.vertices(e), e)
      val want = brute(edges)
      val gx = graph.GxBetweenness.exact(gr).as[(Long, Double)]
        .collect().toMap
      val df = graph.Betweenness.run(gr, numSources = want.size)
        .as[(Long, Double)].collect().toMap
      assert(gx.keySet == want.keySet)
      for ((id, w) <- want) {
        assert(math.abs(gx(id) - w) <= 1e-6, s"gx exact $id: ${gx(id)} vs $w")
        assert(math.abs(df(id) - w) <= 1e-6, s"df exact $id: ${df(id)} vs $w")
      }
    }
  }

  test("edge betweenness matches brute-force Brandes edge dependencies") {
    // driver-side reference: per-source edge dependency
    // σv/σw·(1+δw) for tree edges (v,w) of the BFS DAG, pairs halved
    def bruteEdges(edges: Seq[(Long, Long)]): Map[(Long, Long), Double] = {
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val nodes = adj.keySet.toSeq.sorted
      val eb = scala.collection.mutable.Map[(Long, Long), Double]()
        .withDefaultValue(0.0)
      for (s <- nodes) {
        val dist = scala.collection.mutable.Map(s -> 0)
        val sigma = scala.collection.mutable.Map(s -> 1.0).withDefaultValue(0.0)
        val order = scala.collection.mutable.ArrayBuffer[Long]()
        val queue = scala.collection.mutable.Queue(s)
        while (queue.nonEmpty) {
          val v = queue.dequeue(); order += v
          for (w <- adj(v).toSeq.sorted) {
            if (!dist.contains(w)) { dist(w) = dist(v) + 1; queue += w }
            if (dist(w) == dist(v) + 1) sigma(w) += sigma(v)
          }
        }
        val delta = scala.collection.mutable.Map[Long, Double]()
          .withDefaultValue(0.0)
        for (w <- order.reverse; v <- adj(w) if dist.contains(v) &&
            dist(v) == dist(w) - 1) {
          val c = sigma(v) / sigma(w) * (1.0 + delta(w))
          delta(v) += c
          eb((math.min(v, w), math.max(v, w))) += c
        }
      }
      eb.map { case (k, v) => k -> v / 2.0 }.toMap.withDefaultValue(0.0)
    }
    // P3 chain (hand: both edges 2.0), star K1,3 (all 3.0), kite+tail
    val p3 = Seq((1L, 2L), (2L, 3L))
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L))
    val kite = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    for (edges <- Seq(p3, star, kite)) {
      val e = edges.toDF("src", "dst")
      val gr = graph.Graph(graph.GraphBuilder.vertices(e), e)
      val want = bruteEdges(edges)
      val got = graph.GxBetweenness
        .edgeRun(gr, numSources = want.keySet.flatMap(p => Seq(p._1, p._2)).size)
        .as[(Long, Long, Double)].collect()
      got.foreach { case (s, d, b) =>
        val w = want((math.min(s, d), math.max(s, d)))
        assert(math.abs(b - w) <= 1e-6, s"edge ($s,$d): $b vs $w")
      }
    }
    // hand pins (independent of the brute): P3 edges both 2.0
    val e = p3.toDF("src", "dst")
    val gr = graph.Graph(graph.GraphBuilder.vertices(e), e)
    val got = graph.GxBetweenness.edgeRun(gr, numSources = 3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 2.0 && got((2L, 3L)) == 2.0)
  }

  test("betweenness sweep memo: value-keyed, collision-free, survives eviction") {
    // two DISTINCT live graphs must never serve each other's memoized
    // tables (the r9 identityHashCode key could collide); the memo key
    // is the Graph value (frame reference identity), so same-value
    // lookups hit and different graphs always miss
    def mk(edges: Seq[(Long, Long)]): graph.Graph = {
      val e = edges.toDF("src", "dst")
      graph.Graph(graph.GraphBuilder.vertices(e), e)
    }
    val p3 = mk(Seq((1L, 2L), (2L, 3L)))
    val star = mk(Seq((10L, 1L), (10L, 2L), (10L, 3L)))
    val bP3 = graph.GxBetweenness.run(p3, numSources = 3)
      .as[(Long, Double)].collect().toMap
    val bStar = graph.GxBetweenness.run(star, numSources = 4)
      .as[(Long, Double)].collect().toMap
    assert(bP3(2L) == 1.0 && bP3(1L) == 0.0) // middle of the chain
    assert(bStar(10L) == 3.0 && bStar(1L) == 0.0) // the hub
    // same Graph VALUE (same frames): cache hit, identical rows
    val again = graph.GxBetweenness.run(p3, numSources = 3)
      .as[(Long, Double)].collect().toMap
    assert(again == bP3)
    // churn past the LRU cap with fresh graphs, then re-query the
    // first: the evicted entry recomputes to the same answer (and the
    // evicted persisted blocks were freed, not leaked)
    (0 until 9).foreach { i =>
      graph.GxBetweenness.run(
        mk(Seq((100L + i, 200L + i), (200L + i, 300L + i))), numSources = 3)
        .count()
    }
    val after = graph.GxBetweenness.run(mk(Seq((1L, 2L), (2L, 3L))),
      numSources = 3).as[(Long, Double)].collect().toMap
    assert(after == bP3)
  }

  test("svdPlusPlus learns a rating graph: RMSE bounded, factors finite") {
    // bipartite users 1-3 rating items 101-103 in [1,5]; enough signal
    // that 10 gradient sweeps beat the trivial predictor by a wide margin
    val ratings = Seq(
      (1L, 101L, 5.0), (1L, 102L, 4.0), (2L, 101L, 5.0), (2L, 103L, 1.0),
      (3L, 102L, 4.0), (3L, 103L, 1.0))
      .toDF("src", "dst", "rating")
    val (df, rmse) = graft.graph.Gx.svdPlusPlus(ratings, rank = 4, iters = 10)
    val rows = df.as[(Long, Double, Double)].collect()
    assert(rows.length == 6, "one row per user and item vertex")
    assert(rows.forall { case (_, b, n) =>
      !b.isNaN && !n.isNaN && !b.isInfinite && !n.isInfinite })
    // ratings span [1,5] with sd ~1.8; a fitted model must do well
    // under that, and RMSE is definitionally non-negative
    assert(rmse >= 0.0 && rmse < 1.8, s"rmse $rmse")
  }

  test("Gx BFS handles isolated vertex and multiple components") {
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val tg = Graph(GraphBuilder.vertices(e), e)
    val d = Gx.multiSourceBfs(tg, Seq(1L, 10L))
      .as[(Long, Long, Int)].collect().toSet
    assert(d == Set((1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 2),
      (10L, 10L, 0), (10L, 11L, 1)))
  }

  test("neighbor features match a local replay in exact cents") {
    val prices = graft.Tables(spark, sf).part
      .select("p_partkey", "p_retailprice").as[(Long, Double)]
      .collect().toMap
    val edges = g.edges.as[(Long, Long)].collect()
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    val got = graph.GraphQueries.neighborFeatures(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == nbrs.keySet)
    for ((v, ns) <- nbrs) {
      val cents = ns.map(u => math.round(prices(u) * 100)).sum
      val want = BigDecimal(cents / (ns.size * 100.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(v)._1 == ns.size && got(v)._2 == want &&
        got(v)._3 == ns.map(prices).max, s"vertex $v")
    }
  }

  test("distance histogram sums to the landmark-BFS pair count") {
    val bfs = graph.GraphBuilder.landmarkBfs(g, 8)
    val hist = graph.GraphQueries.distanceHistogram(spark, sf)
      .as[(Int, Long)].collect()
    assert(hist.map(_._2).sum == bfs.count())
    // 8 landmarks at distance 0 from themselves
    assert(hist.toMap.getOrElse(0, 0L) == 8L)
  }

  test("effective diameter is consistent with the ANF table") {
    val a = graph.GraphQueries.anf(spark, sf)
      .select("t", "mask_total").as[(Int, Long)].collect().toMap
    val fin = a.values.max
    val want = a.filter { case (_, m) => m.toDouble >= 0.9 * fin }
      .keys.min
    val r = graph.GraphQueries.effectiveDiameter(spark, sf).head()
    assert(r.getInt(0) == want && r.getLong(1) == fin)
    // monotone: reach never shrinks with t
    (0 until 8).foreach(t => assert(a(t) <= a(t + 1)))
  }

  test("temporal link eval: counts consistent, precision matches hits/k") {
    val r = graph.GraphQueries.linkTemporalEval(spark, sf).head()
    val (k, nc, nl, hits) =
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(k == 50 && nc >= 0 && nl >= 0)
    assert(hits >= 0 && hits <= math.min(k.toLong, nl))
    assert(r.getDouble(4) == BigDecimal(hits / 50.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val base = r.getDouble(5)
    assert(base >= 0.0 && base <= 1.0)
  }

  test("NMI: 1 on identical labelings, relabel-invariant, 0 on constant") {
    import org.apache.spark.sql.functions.col
    def lab(pairs: (Long, Long)*) = pairs.toDF("id", "community")
    val x = lab(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L, 6L -> 2L)
    def nmi(a: org.apache.spark.sql.DataFrame,
            b: org.apache.spark.sql.DataFrame): Double =
      graph.GraphQueries.nmiOf(spark,
        a.select(col("id"), col("community").as("a")),
        b.select(col("id"), col("community").as("b")))
        .head().getDouble(4)
    assert(nmi(x, x) == 1.0)
    // bijective relabeling changes nothing
    val y = lab(1L -> 7L, 2L -> 7L, 3L -> 5L, 4L -> 5L, 5L -> 9L, 6L -> 9L)
    assert(nmi(x, y) == 1.0)
    // a constant labeling carries no information: defined 0
    val c = lab((1L to 6L).map(_ -> 0L): _*)
    assert(nmi(x, c) == 0.0)
    // refining one cluster keeps NMI strictly between 0 and 1
    val r = lab(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 1L, 5L -> 2L, 6L -> 2L)
    val v = nmi(x, r)
    assert(v > 0.5 && v < 1.0, s"refinement NMI $v")
  }

  test("powerlaw alpha and clustering-null match local replays") {
    val degs = g.degrees.select("degree").as[Long].collect()
    val tail = degs.filter(_ >= 5)
    val s = tail.map(k => math.round(math.log(k / 4.5) * 1e6)).sum
    val wantAlpha = BigDecimal(1.0 + tail.length * 1e6 / s)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gotA = graph.GraphQueries.powerlawAlpha(spark, sf).head()
    assert(gotA.getInt(0) == 5 && gotA.getLong(1) == tail.length)
    assert(gotA.getDouble(2) == wantAlpha)

    val n = degs.length.toDouble
    val m1 = degs.sum / n
    val m2 = degs.map(k => k * k).sum / n
    val nullcc = (m2 - m1) * (m2 - m1) / (n * m1 * m1 * m1)
    val gotC = graph.GraphQueries.clusteringVsNull(spark, sf).head()
    val obs = g.averageClustering(graph.GraphBuilder.triangles(g))
      .head().getDouble(0)
    assert(gotC.getDouble(0) == obs)
    assert(math.abs(gotC.getDouble(1) - nullcc) < 1e-6)
    assert(math.abs(gotC.getDouble(2) - obs / nullcc) < 1e-5)
  }

  test("densification exponent matches a local ln-regression replay") {
    val r = graph.GraphQueries.densification(spark, sf).head()
    val (n, fv, fe) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0 && fv > 0 && fe > 0)
    // replay: rebuild the monthly cumulative curve from raw tables
    val li = graft.Tables(spark, sf).lineitem
      .select("l_orderkey", "l_partkey")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val om = graft.Tables(spark, sf).orders
      .select(col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("long").as("m"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val byOrder = li.groupBy(_._1)
    val fs = collection.mutable.Map.empty[(Long, Long), Long]
    for ((o, rows) <- byOrder; a <- rows.map(_._2); b <- rows.map(_._2)
         if a < b) {
      val k = (a, b)
      fs(k) = fs.get(k).map(math.min(_, om(o))).getOrElse(om(o))
    }
    val vf = fs.toSeq.flatMap { case ((a, b), m) => Seq(a -> m, b -> m) }
      .groupBy(_._1).map { case (_, ms) => ms.map(_._2).min }
    val months = fs.values.toSeq.distinct.sorted
    val xs = months.map { m =>
      val vc = vf.count(_ <= m).toLong
      val ec = fs.values.count(_ <= m).toLong
      (math.round(math.log(vc.toDouble) * 1e6),
        math.round(math.log(ec.toDouble) * 1e6))
    }
    val nn = xs.length.toLong
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val want = BigDecimal((nn * sxy - sx * sy).toDouble /
      (nn * sxx - sx * sx))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(n == nn && fe == fs.size)
    assert(r.getDouble(3) == want, s"${r.getDouble(3)} vs $want")
  }

  test("influence cascade == local simulation with the same coin") {
    def coin(u: Long, v: Long, t: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ic:$u:$v:$t".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString.take(7)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val edges = g.edges.as[(Long, Long)].collect().toSeq
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    val degs = adj.map { case (k, vs) => k -> vs.size }
    val seeds = degs.toSeq.sortBy { case (id, d) => (-d, id) }
      .take(4).map(_._1)
    var infected = seeds.toSet
    var frontier = seeds.toSet
    val want = collection.mutable.ArrayBuffer((0, seeds.size.toLong))
    for (t <- 1 to 6) {
      val newly = frontier.flatMap(u =>
        adj(u).filter(v => coin(u, v, t) < 20)) -- infected
      want += ((t, newly.size.toLong))
      infected ++= newly; frontier = newly
    }
    val got = graph.GraphQueries.influenceCascade(spark, sf)
      .select("round", "newly_activated").as[(Int, Long)].collect().toSeq
    assert(got.sortBy(_._1) == want.toSeq, s"$got vs $want")
  }

  test("seed comparison == paired local simulations (hub and random)") {
    def coin(u: Long, v: Long, t: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ic:$u:$v:$t".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString.take(7)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val edges = g.edges.as[(Long, Long)].collect().toSeq
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    val degs = adj.map { case (k, vs) => k -> vs.size }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val hubSeeds = degs.toSeq.sortBy { case (id, d) => (-d, id) }
      .take(4).map(_._1)
    val rndSeeds = degs.keys.toSeq
      .sortBy(id => (md5hex(s"seed:$id"), id)).take(4)
    def simulate(seeds: Seq[Long]): Long = {
      var infected = seeds.toSet
      var frontier = seeds.toSet
      for (t <- 1 to 6) {
        val newly = frontier.flatMap(u =>
          adj(u).filter(v => coin(u, v, t) < 2)) -- infected
        infected ++= newly; frontier = newly
      }
      infected.size.toLong
    }
    val got = graph.GraphQueries.seedComparison(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hub" -> simulate(hubSeeds),
      "random" -> simulate(rndSeeds)), s"$got")
  }

  test("attack robustness == local replay; attack beats random failure") {
    val edges = g.edges.as[(Long, Long)].collect().toSeq
    val degs = (edges.map(_._1) ++ edges.map(_._2)).groupBy(identity)
      .map { case (k, vs) => k -> vs.size }
    val nv = degs.size.toLong
    val got = graph.GraphQueries.attackRobustness(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val want = Seq(1, 5, 10).map { pct =>
      val nRemove = (nv * pct / 100).toInt
      val removed = degs.toSeq.sortBy { case (id, d) => (-d, id) }
        .take(nRemove).map(_._1).toSet
      val keptV = degs.keySet -- removed
      val kept = edges.filter { case (s, d) =>
        !removed(s) && !removed(d) }
      val parent = collection.mutable.Map(keptV.toSeq.map(v => v -> v): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      kept.foreach { case (s, d) => parent(find(s)) = find(d) }
      val comps = keptV.groupBy(find)
      (pct, keptV.size.toLong, comps.size.toLong,
        if (comps.isEmpty) 1L else comps.values.map(_.size).max.toLong)
    }
    assert(got == want, s"$got vs $want")
  }

  test("percolation rows == local union-find replay with the same coin") {
    def coin(src: Long, dst: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"perc:$src:$dst".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString.take(7)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val edges = g.edges.as[(Long, Long)].collect().toSeq
    val allVs = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val got = graph.GraphQueries.percolation(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val want = Seq(25, 50, 75).map { p =>
      val kept = edges.filter { case (s, d) => coin(s, d) < p }
      val parent = collection.mutable.Map(allVs.map(v => v -> v): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      kept.foreach { case (s, d) => parent(find(s)) = find(d) }
      val comps = allVs.groupBy(find)
      (p, kept.size.toLong, comps.size.toLong,
        comps.values.map(_.size).max.toLong)
    }
    assert(got == want, s"$got vs $want")
  }

  test("ANF sketch == OR-over-t-ball local replay (toys + real graph)") {
    // the invariant the distributed fixpoint must satisfy: after t
    // rounds, sketch j of v is the OR of the INIT masks of every u
    // with d(u,v) <= t — so replaying balls via local BFS pins the
    // whole iteration exactly, not just statistically
    def initMask(j: Int, id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s"anf:$j:$id".getBytes("UTF-8"))
      val h = ((d(0) & 0xFFL) << 20) | ((d(1) & 0xFFL) << 12) |
        ((d(2) & 0xFFL) << 4) | ((d(3) & 0xFFL) >>> 4)
      if (h == 0L) 1 << 28 else (h & -h).toInt
    }
    def check(edges: Seq[(Long, Long)], rounds: Int): Unit = {
      val e = edges.toDF("src", "dst")
      val gg = Graph(GraphBuilder.vertices(e), e)
      val adj = (edges ++ edges.map(_.swap)).distinct.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2) }
      val ids = adj.keys.toSeq
      def ball(s: Long, t: Int): Set[Long] = {
        var cur = Set(s); var frontier = Set(s); var d = 0
        while (d < t && frontier.nonEmpty) {
          frontier = frontier.flatMap(u => adj.getOrElse(u, Nil)) -- cur
          cur ++= frontier; d += 1
        }
        cur
      }
      val want = (0 to rounds).map { t =>
        t -> ids.map { v =>
          val b = ball(v, t)
          (0 until 8).map { j =>
            val m = b.map(u => initMask(j, u)).reduce(_ | _)
            ((m + 1) & ~m).toLong
          }.sum
        }.sum
      }.toMap
      val got = Gx.anf(gg, rounds).select("t", "mask_total")
        .as[(Int, Long)].collect().toMap
      assert(got == want, s"anf mismatch: $got vs $want")
    }
    // path P5 (balls grow one hop per round) + a disconnected pair
    check(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L)), 5)
    // star: saturates in 2 rounds; extra rounds must be no-ops
    check(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)), 4)
    // the real sf0.001 co-purchase graph
    check(g.edges.as[(Long, Long)].collect().toSeq, 4)
  }
}
