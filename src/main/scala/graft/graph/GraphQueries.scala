package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SparkEntry-facing wrappers for the static graph metrics (SURVEY §2).
  * Every function returns a deterministic, oracle-comparable DataFrame.
  */
object GraphQueries {

  def edges(spark: SparkSession, dir: String): DataFrame =
    GraphBuilder.coPurchase(spark, dir).edges
      .orderBy("src", "dst")

  def degree(spark: SparkSession, dir: String): DataFrame =
    GraphBuilder.coPurchase(spark, dir).degrees
      .orderBy("id")

  def degreeHistogram(spark: SparkSession, dir: String): DataFrame =
    GraphBuilder.coPurchase(spark, dir).degreeHistogram
      .orderBy("degree")

  def avgDegree(spark: SparkSession, dir: String): DataFrame =
    GraphBuilder.coPurchase(spark, dir).degrees
      .agg(round(avg("degree"), 4).as("avg_degree"))

  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    GraphBuilder.triangles(g).select("id", "triangles").orderBy("id")
  }

  def clusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    g.clusteringCoefficients(GraphBuilder.triangles(g))
      .select(col("id"), col("degree"), col("triangles"),
        round(col("clustering_coeff"), 6).as("clustering_coeff"))
      .orderBy("id")
  }

  def avgClustering(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    g.averageClustering(GraphBuilder.triangles(g))
  }

  def transitivity(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    g.transitivity(GraphBuilder.triangles(g))
  }

  def connectedComponents(spark: SparkSession, dir: String): DataFrame =
    Gx.connectedComponents(GraphBuilder.coPurchase(spark, dir))
      .orderBy("id")

  def labelPropagation(spark: SparkSession, dir: String): DataFrame =
    GraphBuilder.communities(spark, GraphBuilder.coPurchase(spark, dir))
      .orderBy("id")

  def communityCount(spark: SparkSession, dir: String): DataFrame =
    GraphBuilder.communities(spark, GraphBuilder.coPurchase(spark, dir))
      .agg(countDistinct("community").as("n_communities"))

  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    // slot 0 of the shared rank table = uniform-teleport PageRank
    Gx.standardRanks(g, rankHubs(g))
      .filter(col("slot") === 0)
      .select(col("id"), round(col("rank"), 6).as("pagerank"))
      .orderBy("id")
  }

  def bfsLandmarks(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    GraphBuilder.landmarkBfs(g, 8)
      .join(Iterative.topDegreeLandmarks(g, 4)
        .withColumnRenamed("id", "landmark"), Seq("landmark"), "left_semi")
      .orderBy("landmark", "v")
  }

  def closeness(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    Iterative.closenessFrom(GraphBuilder.landmarkBfs(g, 8)).orderBy("id")
  }

  /** Harmonic centrality over the same cached landmark BFS table —
    * the fourth query served by the one multi-source traversal. */
  def harmonic(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    Iterative.harmonicFrom(GraphBuilder.landmarkBfs(g, 8)).orderBy("id")
  }

  /** Landmark global efficiency (nx.global_efficiency restricted to
    * the landmark rows — the same approximation family as closeness/
    * harmonic): mean of 1/d(landmark, v) over reachable v ≠ landmark.
    * The FIFTH query served by the one cached multi-source BFS; each
    * 1/d term is quantized to 1e-9 micro-units and summed exactly, so
    * the 6-dp mean is engine-identical. */
  def globalEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    GraphBuilder.landmarkBfs(g, 8)
      .filter(col("dist") > 0)
      .select((round(lit(1e9) / col("dist"))).cast("long").as("u"))
      .agg(round(sum("u") / count(lit(1)) / 1e9, 6).as("global_efficiency"))
  }

  def density(spark: SparkSession, dir: String): DataFrame =
    Metrics.density(GraphBuilder.coPurchase(spark, dir))

  def assortativity(spark: SparkSession, dir: String): DataFrame =
    Metrics.degreeAssortativity(GraphBuilder.coPurchase(spark, dir))

  def neighborJaccard(spark: SparkSession, dir: String): DataFrame =
    Metrics.neighborJaccard(GraphBuilder.coPurchase(spark, dir))
      .orderBy("src", "dst")

  def kCore(spark: SparkSession, dir: String): DataFrame =
    Metrics.kCore(GraphBuilder.coPurchase(spark, dir), k = 4)
      .orderBy("id")

  /** Full core decomposition: per-vertex coreness (delta Pregel;
    * [[Metrics.coreNumbers]] is the spec-asserted DataFrame twin). */
  def coreNumbers(spark: SparkSession, dir: String): DataFrame =
    Gx.coreNumbers(GraphBuilder.coPurchase(spark, dir))
      .orderBy("id")

  /** Core-number size distribution (k-shell profile): how many
    * vertices sit at each coreness — the one-page density fingerprint
    * of the graph. Rides the memoized [[Gx.coreNumbers]] fixpoint;
    * the distribution itself is one ≤-max-core-row groupBy. */
  def coreSizes(spark: SparkSession, dir: String): DataFrame =
    Gx.coreNumbers(GraphBuilder.coPurchase(spark, dir))
      .groupBy("core")
      .agg(count(lit(1)).as("n_vertices"))
      .orderBy("core")

  /** DOULION-style sampled triangle estimate (Tsourakakis et al.
    * 2009): keep each edge with probability 1/mod via a DETERMINISTIC
    * md5 coin (so the "random" sample replays identically in any
    * engine — the portable-choice move the walk corpus uses), count
    * triangles on the sparsified graph with the same oriented
    * intersection kernel, scale by mod³. At 100 TB this is the
    * triangles-path when exact counting is too expensive: the kernel's
    * cost drops ~p² in wedges while the estimator stays unbiased;
    * the exact count stays available as [[triangles]]. Output carries
    * both the sampled count and the estimate, plus edge tallies, so
    * the oracle pins the entire sampling pipeline exactly. */
  private val triEstCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def triangleEstimate(spark: SparkSession, dir: String,
                       mod: Int = 4, seed: Long = 42L): DataFrame =
    triEstCache.getOrElseUpdate(
      s"${graft.GraftSession.sessionKey(spark, dir)}#$mod:$seed",
      graft.Materialize.table(computeTriangleEstimate(spark, dir, mod, seed)))

  private def computeTriangleEstimate(spark: SparkSession, dir: String,
                                      mod: Int, seed: Long): DataFrame =
    triangleEstimateOn(GraphBuilder.coPurchase(spark, dir), mod, seed)

  /** [[triangleEstimate]] on an explicit graph — private[graft] so the
    * fallback-gate spec and the bench's synthetic-graph probes can
    * drive the above-gate (no-broadcast) branch end-to-end. */
  private[graft] def triangleEstimateOn(g: Graph,
                                        mod: Int, seed: Long): DataFrame = {
    val coin = conv(substring(md5(concat(col("src"), lit(":"),
      col("dst"), lit(s":$seed"))), 1, 7), 16, 10).cast("long") % mod
    val se = g.edges.filter(coin === 0)
    // LEAN one-shot oriented-intersection count: the general Graph
    // pipeline materializes ~8 session tables (vertex join, degree
    // table, oriented edges, adjacency, intersection stream …) that
    // only pay off across repeated consumers — for the single-use
    // sampled graph that overhead measured 16 s vs ~4 s for this
    // inline plan (degrees straight off the edges, no vertex join;
    // adjacency broadcast under the same gate; nothing persisted).
    val deg = se.select(col("src").as("id"))
      .union(se.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    // same ≤500k-vertex gate as Graph's own kernels: a 1/mod edge
    // sample of a big graph still has ~|V| distinct endpoints, so an
    // unconditional broadcast would blow the limit exactly on the
    // large graphs this estimator targets (g.vertexCount bounds the
    // sampled vertex set from above — a free, conservative proxy)
    val small = g.vertexCount <= Graph.broadcastVertexGate
    val bdeg = if (small) broadcast(deg) else deg
    val oriented = se
      .join(bdeg.select(col("id").as("src"), col("degree").as("sdeg")), "src")
      .join(bdeg.select(col("id").as("dst"), col("degree").as("ddeg")), "dst")
      .select(
        when(col("sdeg") < col("ddeg") ||
             (col("sdeg") === col("ddeg") && col("src") < col("dst")),
          struct(col("src").as("lo"), col("dst").as("hi")))
          .otherwise(struct(col("dst").as("lo"), col("src").as("hi")))
          .as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    val adjPlain = oriented.groupBy(col("lo").as("v"))
      .agg(sort_array(collect_list(col("hi"))).as("nbrs"))
    val adj = if (small) broadcast(adjPlain) else adjPlain
    val sampled = oriented
      .join(adj.select(col("v").as("lo"), col("nbrs").as("nu")), "lo")
      .join(adj.select(col("v").as("hi"), col("nbrs").as("nv")), Seq("hi"), "left")
      .select(size(graft.functions.SortedLongIntersect.sortedIntersect(
        col("nu"),
        coalesce(col("nv"), typedLit(Array.empty[Long])))).cast("long").as("t"))
      .agg(coalesce(sum("t"), lit(0L)).as("sampled_triangles"))
    g.edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(se.agg(count(lit(1)).as("n_sampled")))
      .crossJoin(sampled)
      .select(col("n_edges"), col("n_sampled"),
        coalesce(col("sampled_triangles"), lit(0L)).as("sampled_triangles"),
        (coalesce(col("sampled_triangles"), lit(0L)) *
          (mod.toLong * mod * mod)).as("est_triangles"))
  }

  /** 12-truss of the co-purchase graph: the clique-ish dense core
    * (every surviving edge closes ≥ 10 triangles among survivors). */
  def kTruss(spark: SparkSession, dir: String): DataFrame =
    Metrics.kTruss(GraphBuilder.coPurchase(spark, dir), k = 12)
      .orderBy("src", "dst")

  def modularity(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    Metrics.modularity(g, GraphBuilder.communities(spark, g))
  }

  def componentSizes(spark: SparkSession, dir: String): DataFrame =
    Metrics.componentSizes(GraphBuilder.coPurchase(spark, dir))
      .orderBy("size")

  /** One-row whole-graph summary — the metric block the reference
    * PRINTS at the end of a run (main.py:129-159: |V|, |E|, average
    * degree, average clustering, transitivity, components, diameter).
    * Every input is a session-cached table (degrees, triangle stream,
    * CC labels, double-sweep diameter), so the summary is a crossJoin
    * of one-row aggregates — the dashboard query costs nothing extra. */
  def summary(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val tri = GraphBuilder.triangles(g)
    val counts = spark.range(1).select(
      lit(g.vertexCount).as("n_vertices"))
      .crossJoin(g.edges.agg(count(lit(1)).as("n_edges")))
    val degAvg = g.degrees.agg(round(avg("degree"), 4).as("avg_degree"))
    val clus = g.averageClustering(tri)
    val trans = g.transitivity(tri)
    val comps = Gx.connectedComponents(g)
      .agg(countDistinct("component").as("n_components"))
    val diam = GraphBuilder.diameter(g)
    counts.crossJoin(degAvg).crossJoin(clus).crossJoin(trans)
      .crossJoin(comps).crossJoin(diam)
  }

  /** DeepWalk-style walk corpus (Perozzi et al. 2014): fixed-length
    * random walks from a deterministic start set, emitted long-form as
    * (walk_id, step, vertex) — the training corpus a skip-gram graph
    * embedding consumes, and the graph-side twin of the text pipeline's
    * sequence operators. Every step choice is
    * md5("seed:walk:step") mod degree over the SORTED adjacency array
    * (the [[CommunitySample]] portable-walk idiom), so the corpus is
    * bit-identical on any engine — the DuckDB oracle replays all steps.
    *
    * Scale shape: NO per-task graph state (unlike the flagship's
    * community-local walks — these are global walks): the adjacency
    * table is built once (one shuffle, sorted row-local) and each step
    * is ONE hash join of the |starts|-row frontier against it; `steps`
    * joins total, all expressions native (md5/conv/element_at — no
    * UDF). 100 TB: frontier and adjacency co-partition on the join
    * key; walk count scales with the vertex stride. */
  def walkCorpus(spark: SparkSession, dir: String, steps: Int = 8,
                 stride: Long = 20L, seed: Long = 42L): DataFrame =
    uniformWalks(GraphBuilder.coPurchase(spark, dir), steps, stride, seed)

  /** Graph-parameterized core of [[walkCorpus]]. */
  def uniformWalks(g: Graph, steps: Int, stride: Long,
                   seed: Long): DataFrame = {
    // collectNeighborIds is persisted on the Graph; this is a pure
    // column rename over that shared cache
    val adj = g.collectNeighborIds
      .select(col("id").as("pos"), col("neighbor_ids").as("nbrs"))
    var state = g.vertices.filter(col("id") % stride === 0)
      .select(col("id").as("walk_id"), col("id").as("pos"),
        array(col("id")).as("seq"))
    for (t <- 1 to steps) {
      val choice = (conv(substring(md5(concat_ws(":",
        lit(seed), col("walk_id"), lit(t))), 1, 8), 16, 10)
        .cast("long") % size(col("nbrs"))).cast("int")
      state = broadcast(state).join(adj, "pos")
        .withColumn("nxt", element_at(col("nbrs"), choice + 1))
        .select(col("walk_id"), col("nxt").as("pos"),
          concat(col("seq"), array(col("nxt"))).as("seq"))
    }
    val out = state
      .select(col("walk_id"), posexplode(col("seq")).as(Seq("step", "vertex")))
      .orderBy("walk_id", "step")
    out
  }

  /** node2vec-biased walk corpus (Grover & Leskovec 2016): second-order
    * walks with return parameter p=1/2 and in-out parameter q=2 —
    * unnormalized neighbor weights ×2 give INTEGERS {4: back to the
    * previous vertex, 2: common neighbor of prev (BFS-ish), 1: outward
    * (DFS-ish)}. Each step draws r = md5("n2v:seed:walk:t") mod
    * Σweights and picks the sorted neighbor whose cumulative-weight
    * range covers r — exact integer arithmetic end to end, so the
    * corpus replays bit-identically in the SQL oracle. prev starts as
    * the start vertex itself: a vertex is never its own neighbor, so
    * step 1's rule degenerates to the uniform all-weight-2 draw — one
    * rule for every step.
    *
    * Scale shape: the join-based frontier of [[walkCorpus]], joined
    * against the adjacency table TWICE per step (current + previous).
    * The frontier is broadcast into both joins (it is |starts| rows
    * against a graph-sized adjacency — a shuffle of the adjacency per
    * step would dominate), and the weight/pick math is ONE compiled
    * merge-walk over the two sorted arrays ([[Node2vecPick]]) — the
    * lambda formulation's interpreted array_contains-per-neighbor was
    * O(deg²) per row and dominated the step cost. */
  def node2vecCorpus(spark: SparkSession, dir: String, steps: Int = 8,
                     stride: Long = 20L, seed: Long = 42L): DataFrame =
    node2vecWalks(GraphBuilder.coPurchase(spark, dir), steps, stride, seed)

  /** Graph-parameterized core of [[node2vecCorpus]] (spec-testable on
    * toy graphs). */
  def node2vecWalks(g: Graph, steps: Int, stride: Long,
                    seed: Long): DataFrame = {
    val adj = g.collectNeighborIds // persisted on the Graph
    val cadj = adj.select(col("id").as("pos"), col("neighbor_ids").as("nbrs"))
    val padj = adj.select(col("id").as("prev"), col("neighbor_ids").as("pnbrs"))
    var state = g.vertices.filter(col("id") % stride === 0)
      .select(col("id").as("walk_id"), col("id").as("pos"),
        col("id").as("prev"), array(col("id")).as("seq"))
    for (t <- 1 to steps) {
      val draw = conv(substring(md5(concat_ws(":",
        lit("n2v"), lit(seed), col("walk_id"), lit(t))), 1, 8), 16, 10)
        .cast("long")
      state = broadcast(state).join(cadj, "pos")
      state = broadcast(state).join(padj, "prev")
        .withColumn("nxt", graft.functions.WalkColumns.node2vecPick(
          col("nbrs"), col("pnbrs"), col("prev"), draw))
        .select(col("walk_id"), col("nxt").as("pos"), col("pos").as("prev"),
          concat(col("seq"), array(col("nxt"))).as("seq"))
    }
    state
      .select(col("walk_id"), posexplode(col("seq")).as(Seq("step", "vertex")))
      .orderBy("walk_id", "step")
  }

  /** Weighted PageRank over the co-purchase edge weights. */
  def weightedPageRank(spark: SparkSession, dir: String): DataFrame =
    Gx.weightedPageRank(GraphBuilder.weightedEdges(spark, dir))
      .select(col("id"), round(col("rank"), 6).as("wpagerank"))
      .orderBy("id")

  /** Weighted degree (vertex strength): sum of incident edge weights. */
  def weightedDegree(spark: SparkSession, dir: String): DataFrame = {
    val we = GraphBuilder.weightedEdges(spark, dir)
    we.select(col("src").as("id"), col("weight"))
      .union(we.select(col("dst").as("id"), col("weight")))
      .groupBy("id").agg(sum("weight").as("strength"))
      .orderBy("id")
  }

  /** Weighted clustering coefficient (Barrat et al. 2004):
    * c_w(u) = 1/(s_u·(k_u−1)) · Σ_{triangles at u} (w_uv + w_uw)/2.
    * Barrat (arithmetic mean) rather than Onnela (geometric): integer
    * co-purchase weights make every intermediate an EXACT long — per
    * triangle each edge's weight lands on both its endpoints, so the
    * numerator is one explode + one sum over the persisted triangle
    * stream, halved once at the end; cube roots (Onnela) would ride
    * non-correctly-rounded pow() across engines. ONE weight join keyed
    * by canonical edge, co-partitioned. */
  def weightedClustering(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val we = GraphBuilder.weightedEdges(spark, dir)
    // 3 canonical edges per triangle, one row each
    val triEdges = g.triangleEnumeration.select(
        explode(array(
          // lo/hi are DEGREE-ordered; the weight table is id-canonical
          struct(least(col("lo"), col("hi")).as("src"),
            greatest(col("lo"), col("hi")).as("dst")),
          struct(least(col("lo"), col("w")).as("src"),
            greatest(col("lo"), col("w")).as("dst")),
          struct(least(col("hi"), col("w")).as("src"),
            greatest(col("hi"), col("w")).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // broadcast the weight table under an EDGE-count gate (r9): the
      // probe side is 3 rows per triangle — an order of magnitude
      // wider than |E| — and Catalyst's size estimate of the memoized
      // weight table defeats auto-broadcast, so the un-hinted plan
      // shuffled the whole triangle stream to meet a 30 MB table
      .join(if (we.count() <= 5000000L) broadcast(we) else we,
        Seq("src", "dst"))
    val triW = triEdges
      .select(explode(array(col("src"), col("dst"))).as("id"), col("weight"))
      .groupBy("id").agg(sum("weight").as("tri_w2"))
    val strength = we.select(col("src").as("id"), col("weight"))
      .union(we.select(col("dst").as("id"), col("weight")))
      .groupBy("id").agg(sum("weight").as("strength"))
    g.degrees.join(strength, Seq("id"))
      .join(triW, Seq("id"), "left")
      .na.fill(0L, Seq("tri_w2"))
      .select(col("id"), col("degree"), col("strength"),
        when(col("degree") >= 2,
          round((col("tri_w2") / 2.0) /
            (col("strength") * (col("degree") - 1)), 6))
          .otherwise(0.0).as("weighted_clustering"))
      .orderBy("id")
  }

  /** Louvain phase-1 communities (4 parity-alternating exact-integer
    * modularity-gain move rounds) over the weighted co-purchase graph. */
  // g_louvain exposes the phase-1 labels and g_louvain2 starts from the
  // SAME phase-1 labeling — memoize one move loop per dir for both
  private val louvainP1Cache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private[graft] def louvainPhase1(spark: SparkSession, dir: String): DataFrame =
    louvainP1Cache.getOrElseUpdate(graft.GraftSession.sessionKey(spark, dir),
      graft.Materialize.table(
        Iterative.louvainMoves(GraphBuilder.weightedEdges(spark, dir))))

  def louvain(spark: SparkSession, dir: String): DataFrame =
    louvainPhase1(spark, dir).orderBy("id")

  /** Full two-level Louvain (Blondel's loop: phase-1 moves, contract,
    * phase-2 moves on the supergraph) over the weighted co-purchase
    * graph — same exact-integer gain rule both levels. */
  // phase 2 gained a second consumer (g_community_nmi) in late r7 —
  // memoize the contracted move loop like phase 1, one build per dir
  private val louvain2Cache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  def louvain2(spark: SparkSession, dir: String): DataFrame =
    louvain2Cache.getOrElseUpdate(graft.GraftSession.sessionKey(spark, dir),
      graft.Materialize.table(Iterative.louvainTwoLevelFrom(
        GraphBuilder.weightedEdges(spark, dir),
        louvainPhase1(spark, dir))))
      .orderBy("id")

  /** Rank-offset speculative greedy coloring of the co-purchase graph.
    * Rounds pinned to the oracle's 12-round unroll (measured fixpoint
    * ≤6 at every SF) so Spark and the oracle agree BY CONSTRUCTION
    * even on a hypothetical graph that hasn't converged by then — the
    * spec's full-coloring assert is the loud failure if that margin
    * ever erodes. */
  def coloring(spark: SparkSession, dir: String): DataFrame =
    Iterative.greedyColoring(GraphBuilder.coPurchase(spark, dir), rounds = 12)
      .orderBy("id")

  /** Minimum spanning forest of the weighted co-purchase graph
    * (distributed Borůvka; unique under the strict edge order). */
  def mst(spark: SparkSession, dir: String): DataFrame =
    Iterative.minimumSpanningForest(GraphBuilder.weightedEdges(spark, dir))

  /** Weighted SSSP from the top-degree vertex: exact min-cost distances
    * over the integer co-purchase weights (nx.dijkstra parity). */
  def weightedSssp(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val src = Iterative.topDegreeLandmarks(g, 1).collect().head.getLong(0)
    Gx.weightedSssp(GraphBuilder.weightedEdges(spark, dir), src)
      .orderBy("id")
  }

  def betweenness(spark: SparkSession, dir: String): DataFrame =
    GxBetweenness.run(GraphBuilder.coPurchase(spark, dir), numSources = 8)
      .orderBy("id")

  /** Edge betweenness (Girvan–Newman criterion) — see
    * [[GxBetweenness.edgeRun]]. Same seeded Brandes estimator as
    * [[betweenness]]; the non-trivial top of the ranking is the
    * graph's sparsest cut candidates. */
  def edgeBetweenness(spark: SparkSession, dir: String): DataFrame =
    GxBetweenness.edgeRun(GraphBuilder.coPurchase(spark, dir), numSources = 8)
      .orderBy("src", "dst")

  /** FLAGSHIP: community-partitioned parallel random-walk sample. */
  def communitySample(spark: SparkSession, dir: String): DataFrame =
    CommunitySample.sample(spark, GraphBuilder.coPurchase(spark, dir))
      .orderBy("community", "id")

  /** Community quotient (coarsened) graph: one super-vertex per
    * Louvain community, super-edges = original edge count + summed
    * co-purchase weight between the community pair (ca ≤ cb; ca = cb
    * rows carry the intra-community mass). The contraction step of
    * multilevel partitioners/layouts and the one-page "how modular is
    * this graph" surface. Louvain labels, not LPA: LPA collapses this
    * dense co-purchase graph into ONE community (a known LPA failure
    * mode), while the modularity moves keep a real partition.
    *
    * Scale shape: rides the memoized Louvain phase-1 labeling; two
    * vertex-keyed equi-joins tag each edge endpoint, then ONE
    * map-side-combined groupBy on the (tiny) community-pair key —
    * the same contraction plan louvain2 itself uses. */
  def communityGraph(spark: SparkSession, dir: String): DataFrame = {
    val labels = louvainPhase1(spark, dir)
    GraphBuilder.weightedEdges(spark, dir)
      .join(labels.select(col("id").as("src"), col("community").as("c1")),
        "src")
      .join(labels.select(col("id").as("dst"), col("community").as("c2")),
        "dst")
      .groupBy(least(col("c1"), col("c2")).as("ca"),
        greatest(col("c1"), col("c2")).as("cb"))
      .agg(count(lit(1)).as("n_edges"),
        sum("weight").cast("long").as("weight"))
      .orderBy("ca", "cb")
  }

  /** Sample-quality summary: the metric suite recomputed on the
    * subgraph induced by the community sample, next to the original
    * graph's values (ref main.py:197-229 rebuilds a NetworkX graph of
    * the sampled edges and reruns every metric driver-side; here the
    * induced subgraph stays a distributed Graph and reuses the same
    * DataFrame algebra). Single-row comparison surface. */
  def sampleMetrics(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val sampled = CommunitySample.sample(spark, g)
      .select(col("id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val se = g.inducedSubgraphEdges(sampled)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // triangles of the induced subgraph = global triangles with all
    // three vertices sampled — FILTER the graph's persisted enumeration
    // (semi-joins against the sample set) instead of running a second
    // orientation+intersection pipeline on the subgraph (measured
    // minutes vs seconds at sf0.1)
    val sid = broadcast(sampled)
    val triSub = g.triangleEnumeration
      .join(sid.withColumnRenamed("id", "lo"), Seq("lo"), "left_semi")
      .join(sid.withColumnRenamed("id", "hi"), Seq("hi"), "left_semi")
      .join(sid.withColumnRenamed("id", "w"), Seq("w"), "left_semi")
    val triPerVertex = triSub.select(col("lo").as("id"))
      .union(triSub.select(col("hi").as("id")))
      .union(triSub.select(col("w").as("id")))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val subDeg = se.select(col("src").as("id"))
      .union(se.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val stats = sampled
      .join(subDeg, Seq("id"), "left").na.fill(0L, Seq("degree"))
      .join(triPerVertex, Seq("id"), "left").na.fill(0L, Seq("triangles"))
      .agg(
        count(lit(1)).as("sample_vertices"),
        avg(when(col("degree") >= 2,
          lit(2.0) * col("triangles") / (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0))).as("sample_avg_clustering"),
        (sum("triangles") / 3).as("tri_total"),
        sum(col("degree") * (col("degree") - 1) / 2).as("wedge_total"),
        sum("degree").as("deg_total"))
      .head()
    // avg degree next to clustering/transitivity: the reference's
    // sampled-vs-original comparison reports it too (main.py:213-215 /
    // :141-144); isolated sampled vertices count with degree 0, same
    // as the nx.degree average over all nodes
    val origRow = g.averageClustering(GraphBuilder.triangles(g))
      .crossJoin(g.transitivity(GraphBuilder.triangles(g)))
      .crossJoin(g.degrees.agg(
        round(avg(col("degree")), 6).as("orig_avg_degree")))
      .head()
    val result = spark.range(1).select(
      lit(stats.getLong(0)).as("sample_vertices"),
      lit(se.count()).as("sample_edges"),
      round(lit(stats.getLong(4).toDouble / stats.getLong(0)), 6)
        .as("sample_avg_degree"),
      round(lit(stats.getDouble(1)), 6).as("sample_avg_clustering"),
      round(lit(if (stats.getDouble(3) > 0)
          3.0 * stats.getDouble(2) / stats.getDouble(3) else 0.0), 6)
        .as("sample_transitivity"),
      lit(origRow.getDouble(2)).as("orig_avg_degree"),
      lit(origRow.getDouble(0)).as("orig_avg_clustering"),
      lit(origRow.getDouble(1)).as("orig_transitivity"))
    // every consumer above was eager (head/count) and the result row is
    // pure literals — free the query-local caches before returning
    sampled.unpersist(blocking = false)
    se.unpersist(blocking = false)
    result
  }

  /** The top-4 degree hubs — the shared source set of the rank-family
    * queries (deterministic: degree desc, id asc). */
  private def rankHubs(g: Graph): Seq[Long] =
    Iterative.topDegreeLandmarks(g, 4).collect().map(_.getLong(0)).toSeq

  def personalizedPageRank(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    // slot 1 of the shared rank table = PPR from the max-degree vertex
    Gx.standardRanks(g, rankHubs(g))
      .filter(col("slot") === 1)
      .select(col("id"), round(col("rank"), 6).as("ppr"))
      .orderBy("id")
  }

  /** Parallel personalized PageRank from the top-4 degree hubs — one
    * array-state message loop serves all four sources (GraphFrames
    * `parallelPersonalizedPageRank` parity) AND the uniform PageRank
    * slot, via [[Gx.standardRanks]]. */
  def pprParallel(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val sources = rankHubs(g)
    val srcCol = element_at(
      array(sources.map(lit): _*), col("slot").cast("int"))
    Gx.standardRanks(g, sources)
      .filter(col("slot") >= 1)
      .select(col("id"), srcCol.as("source"),
        round(col("rank"), 6).as("ppr"))
      .orderBy("id", "source")
  }

  def avgPathLength(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    Iterative.avgPathLength(GraphBuilder.landmarkBfs(g, 8))
  }

  /** Landmark eccentricity: max hop distance from each landmark —
    * free from the cached BFS table (diameter ≥ max eccentricity). */
  def eccentricity(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    GraphBuilder.landmarkBfs(g, 8)
      .groupBy(col("landmark"))
      .agg(max("dist").as("eccentricity"))
      .orderBy("landmark")
  }

  def diameter(spark: SparkSession, dir: String): DataFrame =
    GraphBuilder.diameter(GraphBuilder.coPurchase(spark, dir))

  /** Normalized mutual information between the phase-1 and two-level
    * Louvain labelings — the standard clustering-agreement score
    * (NMI = MI / √(H_A·H_B)), here measuring how much the contraction
    * level coarsens the communities. (LPA is the degenerate partner
    * on this graph — it converges to ONE label at sf0.01, H = 0.)
    * Both labelings ride their session caches; the only new work is
    * ONE (a,b)-keyed contingency aggregate (≤ #communities² rows) +
    * its marginals. Every MI/entropy term is 1e-6-quantized to an
    * exact long before the order-free sum (the cluster-entropy
    * portability move), so the whole statistic replays in SQL. */
  def communityNmi(spark: SparkSession, dir: String): DataFrame =
    nmiOf(spark,
      louvain(spark, dir).select(col("id"), col("community").as("a")),
      louvain2(spark, dir).select(col("id"), col("community").as("b")))

  /** NMI core over two labelings (id, a) / (id, b) — see
    * [[communityNmi]] for semantics and portability. */
  def nmiOf(spark: SparkSession, a: DataFrame, b: DataFrame): DataFrame = {
    val n = a.count()
    val ct = a.join(b, "id").groupBy("a", "b").agg(count(lit(1)).as("nij"))
    val ma = ct.groupBy("a").agg(sum("nij").as("na"))
    val mb = ct.groupBy("b").agg(sum("nij").as("nb"))
    val nd = lit(n.toDouble)
    val miL = ct.join(ma, "a").join(mb, "b")
      .select(round((col("nij") / nd) *
        log((col("nij") * lit(n)) / (col("na") * col("nb"))) * 1e6)
        .cast("long").as("t"))
      .agg(sum("t")).head().getLong(0)
    val haL = ma.select(round((col("na") / nd) * log(col("na") / nd) * 1e6)
      .cast("long").as("t")).agg(sum("t")).head().getLong(0)
    val hbL = mb.select(round((col("nb") / nd) * log(col("nb") / nd) * 1e6)
      .cast("long").as("t")).agg(sum("t")).head().getLong(0)
    import spark.implicits._
    // exact micro-long scalars in, one-row Spark projection out — the
    // final floats are single divisions of exact integers both engines
    // compute identically
    Seq((n, miL, haL, hbL)).toDF("n_vertices", "mi_l", "ha_l", "hb_l")
      .select(col("n_vertices"),
        round(col("mi_l") / 1e6, 6).as("mi"),
        round(col("ha_l") / lit(-1e6), 6).as("h_a"),
        round(col("hb_l") / lit(-1e6), 6).as("h_b"),
        // a single-community side has H = 0 — NMI is defined 0 there
        // (no information to share), matching the oracle's CASE
        when(col("ha_l") === 0 || col("hb_l") === 0, lit(0.0))
          .otherwise(round((col("mi_l") / 1e6) /
            sqrt((col("ha_l") / lit(-1e6)) * (col("hb_l") / lit(-1e6))),
            6)).as("nmi"))
  }

  /** Power-law degree-exponent MLE (Clauset–Shalizi–Newman 2009): for
    * the degree tail k ≥ kMin, α = 1 + n / Σ ln(k_i / (kMin − ½)) —
    * the discrete-MLE approximation. kMin is fixed (the CSN KS-scan
    * that picks it is a model-selection loop, not a data-scale
    * problem). Scale: one aggregation over the degree table; the ln
    * terms are 1e-6-quantized to exact longs before the order-free
    * sum (the word-entropy portability move), so the distributed sum
    * is deterministic and the oracle replays it. */
  def powerlawAlpha(spark: SparkSession, dir: String,
                    kMin: Int = 5): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    g.degrees.filter(col("degree") >= kMin)
      .agg(count(lit(1)).as("n_tail"),
        sum(round(log(col("degree") / (kMin - 0.5)) * 1e6)
          .cast("long")).as("s"))
      .select(lit(kMin).as("k_min"), col("n_tail"),
        round(lit(1.0) + col("n_tail") * 1e6 / col("s"), 6).as("alpha"))
  }

  /** Observed average clustering vs the configuration-model null
    * expectation C_null = (⟨k²⟩ − ⟨k⟩)² / (n·⟨k⟩³) (Newman): the
    * ratio says how much triadic closure exceeds what degree
    * heterogeneity alone produces — THE test that a graph is actually
    * clustered. Degree moments are exact integer sums; the observed
    * value rides the session triangle stream. */
  def clusteringVsNull(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val obs = g.averageClustering(GraphBuilder.triangles(g))
    val m = g.degrees.agg(count(lit(1)).as("n"),
      sum(col("degree")).as("s1"),
      sum(col("degree") * col("degree")).as("s2"))
      .select(col("n"),
        (col("s1").cast("double") / col("n")).as("m1"),
        (col("s2").cast("double") / col("n")).as("m2"))
      .select(col("n"),
        ((col("m2") - col("m1")) * (col("m2") - col("m1")) /
          (col("n") * col("m1") * col("m1") * col("m1")))
          .as("nullcc"))
    obs.crossJoin(m)
      .select(col("avg_clustering"), round(col("nullcc"), 6)
          .as("null_clustering"),
        round(col("avg_clustering") / col("nullcc"), 6).as("ratio"))
  }

  /** Bond-percolation robustness: keep each edge with probability p
    * (p = 25/50/75%), recompute connected components, report how the
    * graph fragments — the standard resilience-under-random-failure
    * curve (does a giant component survive losing half the edges?).
    *
    * The "random" coin is the portable md5 of the canonical edge (the
    * DOULION sampling move), so the sampled graphs — and therefore
    * every count — replay exactly in any engine. Isolated-by-sampling
    * vertices count as size-1 components (the original vertex set is
    * the universe, nx-style). Scale: three filtered CC runs (GraphX,
    * O(log n) rounds each) over map-side-filtered edge sets; the
    * per-p result is ONE row of aggregates. */
  def percolation(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val nv = g.vertexCount
    val levels = Seq(25, 50, 75)
    // REWORK r8: the three retention levels share one coin per edge,
    // so their kept edge sets are nested — Gx.nestedPercolationCc
    // converges all three in ONE Pregel run over the session-cached
    // graph (was: 3 filtered-subgraph builds + 3 CC runs).
    val scope = new graft.Materialize.Scoped
    val (kept, lab) = Gx.nestedPercolationCc(g, levels, "perc", scope)
    val nvGraph = lab.count()
    val frames = levels.zipWithIndex.map { case (p, i) =>
      // per-level component sizes over ALL graph vertices: isolated-at-
      // level vertices are their own singletons, so nec + (nv − nend)
      // of the old filtered-subgraph form equals the all-vertex
      // component count plus the vertices g counts but the edge set
      // never names
      lab.select(col("labels").getItem(i).as("component"))
        .groupBy("component").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("nec"), max("sz").as("giant"))
        .select(lit(p).as("p_pct"), lit(kept(i)).as("n_edges_kept"),
          (col("nec") + lit(nv) - lit(nvGraph)).as("n_components"),
          col("giant").as("giant_size"))
    }
    scope.seal(frames.reduce(_ union _).orderBy("p_pct"))
  }

  /** Independent-cascade influence spread (the Kempe–Kleinberg–Tardos
    * IC model) from the top-4 degree hubs: each newly activated vertex
    * gets ONE chance per neighbor, succeeding when the portable md5
    * coin of (infector, target, round) lands under p = 20%. Reports
    * newly-activated counts per round — the spread curve an influence-
    * maximization pipeline evaluates seed sets with. Deterministic by
    * construction (the coin is the randomness), so the whole cascade
    * replays in SQL. The coin is keyed (infector, target, round) only
    * — NOT the seed set — so different seed sets face the same edge
    * randomness (common random numbers: a paired, variance-free
    * comparison).
    *
    * Execution is [[Gx.cascadeRounds]] (REWORK r8) — one GraphX
    * superstep per round over the session-cached graph. The r7
    * DataFrame frontier loop it replaces had already learned the
    * flatten-every-round lesson (un-flattened: 443 s of pure planning
    * at sf0.1) but still paid ~1.5 s/round of plan/persist/count fixed
    * cost; the kernel pays ~0.2 s. */
  def influenceCascade(spark: SparkSession, dir: String,
                       rounds: Int = 6, pPct: Int = 20): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    import spark.implicits._
    val seeds = Iterative.topDegreeLandmarks(g, 4)
      .select(col("id")).as[Long].collect()
    val newly = Gx.cascadeRounds(g, Seq(seeds), rounds, pPct)
    val counts = (0 to rounds).map(t => (t, newly(t)(0)))
    counts.toDF("round", "newly_activated")
      .withColumn("cum_activated",
        sum("newly_activated").over(org.apache.spark.sql.expressions
          .Window.orderBy("round")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .orderBy("round")
  }

  /** Influence-maximization seed comparison (Kempe–Kleinberg–Tardos'
    * benchmark question): the SAME cascade — same coin, common random
    * numbers, so the comparison is paired and variance-free — from
    * top-4 HUB seeds vs 4 md5-uniform RANDOM seeds. Hub seeding
    * should beat random (it does: 939 vs 754 at sf0.01); note
    * pagerank-vs-degree is DEGENERATE here (identical top-4 — PR ≈
    * degree on undirected graphs), which is itself the classic
    * finding. p = 2% (vs the spread curve's 20%): the sub-critical
    * regime is where seed choice matters — at 20% ANY seed set
    * saturates this graph. Output: one exact total per seed set.
    * Both strategies ride ONE [[Gx.cascadeRounds]] kernel run as
    * bitmask slots — the round-7 paired-flag DataFrame loop folded the
    * two cascades into one set of frontier joins (halving the top
    * bench line); the r8 GraphX kernel removes the remaining
    * per-round plan/persist/count fixed cost on top. */
  def seedComparison(spark: SparkSession, dir: String,
                     rounds: Int = 6, pPct: Int = 2): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    import spark.implicits._
    val hubSeeds = Iterative.topDegreeLandmarks(g, 4)
      .select(col("id")).as[Long].collect()
    val rndSeeds = g.degrees
      .orderBy(md5(concat(lit("seed:"), col("id"))), col("id")).limit(4)
      .select(col("id")).as[Long].collect()
    val newly = Gx.cascadeRounds(g, Seq(hubSeeds, rndSeeds), rounds, pPct)
    val totals = Seq("hub" -> newly.map(_(0)).sum,
      "random" -> newly.map(_(1)).sum)
    totals.toDF("seed_set", "total_activated").orderBy("seed_set")
  }

  /** Targeted-attack robustness — the complement of [[percolation]]:
    * remove the top 1/5/10% highest-degree vertices (ties: lower id
    * removed first) and recompute the giant component. Scale-free
    * graphs are robust to the random failure percolation measures but
    * FRAGILE to this attack (Albert–Barabási–Jeong 2000) — reporting
    * both curves is the standard resilience analysis. Vertex ranking
    * is one sort of the degree table; each level is a semi-join edge
    * filter + CC; survivors outside the edge set count as size-1. */
  def attackRobustness(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val nv = g.vertexCount
    // Two-phase threshold cut instead of a global row_number window
    // (that window is a single-partition sort of ALL |V| vertices —
    // the one ranking no 100×-scale plan can afford). Phase 1: the
    // degree HISTOGRAM (≤ #distinct degree values, ~O(√|E|) rows on a
    // scale-free graph) carries a descending cumulative count; the
    // removal threshold degree D and the excess inside it fall out of
    // one ≤3-row lookup per level. Phase 2: only the BOUNDARY class
    // (degree == D) needs the id tie-break (lower ids removed first),
    // and the excess-th smallest id is found by range-bucketing the
    // class ids (≤4096 buckets) and sorting ONE bucket — so the keep
    // set is a map-side filter (degree < D ∨ (degree == D ∧ id > T))
    // and nothing |V|-sized is ever sorted or windowed.
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("degree").desc) // over the tiny histogram only
    // query-local: the histogram is only read via eager .head() lookups
    // below, and the returned frames reference literal thresholds —
    // freed once the levels are built
    val scope = new graft.Materialize.Scoped
    val cumHist = scope.table(
      g.degrees.groupBy("degree").agg(count(lit(1)).as("cnt"))
        .select(col("degree"), col("cnt"),
          (sum("cnt").over(wDesc) - col("cnt")).as("above")))
    def boundaryIdThreshold(d: Long, excess: Long): Long = {
      val cls = g.degrees.filter(col("degree") === d).select("id")
      val st = cls.agg(max("id"), count(lit(1))).head()
      val (maxId, nCls) = (st.getLong(0), st.getLong(1))
      if (excess >= nCls) maxId
      else {
        val wdt = math.max(1L, maxId / 4096 + 1)
        val bh = cls.groupBy(floor(col("id") / wdt).cast("long").as("b"))
          .agg(count(lit(1)).as("c")).orderBy("b")
          .collect().map(r => (r.getLong(0), r.getLong(1))) // ≤4096 rows
        var prior = 0L
        var i = 0
        while (prior + bh(i)._2 < excess) { prior += bh(i)._2; i += 1 }
        val bStar = bh(i)._1
        // one bucket-local top-k (~|class|/4096 rows): the excess-th
        // smallest id overall is the (excess-prior)-th inside bStar
        cls.filter(floor(col("id") / wdt).cast("long") === bStar)
          .orderBy("id").limit((excess - prior).toInt)
          .agg(max("id")).head().getLong(0)
      }
    }
    val levels = Seq(1, 5, 10)
    // (degree threshold D, boundary id T) per level — driver-tiny
    val cuts: Array[(Long, Long)] = levels.map { pct =>
      val nRemove = nv * pct / 100 // integer floor, replayed in SQL
      if (nRemove == 0) (Long.MaxValue, Long.MinValue)
      else {
        val b = cumHist.filter(col("above") < nRemove &&
            col("above") + col("cnt") >= nRemove)
          .select(col("degree"), col("above")).head()
        val (d, above) = (b.getLong(0), b.getLong(1))
        (d, boundaryIdThreshold(d, nRemove - above))
      }
    }.toArray
    // REWORK r8: all three attack levels converge in ONE multi-level
    // CC run (was: 3 semi-join subgraph builds + 3 CC runs); the keep
    // predicate is the same map-side threshold filter, evaluated
    // per-triplet as the level mask
    val cutsArr = cuts
    val (_, lab) = Gx.multiLevelCc(g, levels.size, scope,
      (s, sd, d, dd) => {
        var m = 0
        var i = 0
        while (i < cutsArr.length) {
          val (cd, ct) = cutsArr(i)
          // keep(v) = deg < D ∨ (deg == D ∧ id > T), both endpoints
          if ((sd < cd || (sd == cd && s > ct)) &&
              (dd < cd || (dd == cd && d > ct))) m |= 1 << i
          i += 1
        }
        m
      })
    val frames = levels.zipWithIndex.map { case (pct, i) =>
      val nRemove = nv * pct / 100
      val nKept = nv - nRemove
      val c = cuts(i)
      // kept vertices only: removed vertices hold singleton labels in
      // the multi-level table and must not count as components
      lab.filter(col("degree") < c._1 ||
          (col("degree") === c._1 && col("id") > c._2))
        .select(col("labels").getItem(i).as("component"))
        .groupBy("component").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("nec"),
          coalesce(max("sz"), lit(1L)).as("giant"),
          coalesce(sum("sz"), lit(0L)).as("nkl"))
        .select(lit(pct).as("removed_pct"),
          lit(nKept).as("n_kept_vertices"),
          (col("nec") + lit(nKept) - col("nkl")).as("n_components"),
          col("giant").as("giant_size"))
    }
    scope.seal(frames.reduce(_ union _).orderBy("removed_pct"))
  }

  /** ANF neighborhood-function sketch — see [[Gx.anf]]. Emits
    * (t, mask_total, reached_est): the exact integer round statistic
    * plus the FM estimate of #pairs within distance t. The scale
    * answer to "what is the effective diameter / average distance of
    * a 100 TB-derived graph": constant-width per-vertex sketches and
    * one OR-merge traversal per round, where every exact alternative
    * is all-pairs BFS. */
  private val anfCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def anf(spark: SparkSession, dir: String): DataFrame =
    anfCache.getOrElseUpdate(graft.GraftSession.sessionKey(spark, dir),
      graft.Materialize.table(Gx.anf(GraphBuilder.coPurchase(spark, dir))))
      .orderBy("t")

  /** Effective diameter off the memoized ANF table: the smallest t
    * whose sketch-estimated reach covers ≥ 90% of the t=8 reach
    * (HyperANF's standard summary statistic), plus the average of the
    * per-round reach ratios. Pure integer comparisons on the exact
    * mask statistic — zero new graph work. */
  def effectiveDiameter(spark: SparkSession, dir: String): DataFrame = {
    val a = anf(spark, dir)
    val fin = a.select(max("mask_total")).head().getLong(0)
    a.filter(col("mask_total").cast("double") >= lit(0.9) * fin)
      .agg(min("t").as("effective_diameter_90"))
      .select(col("effective_diameter_90"), lit(fin).as("final_mask_total"))
  }

  /** Open-wedge counts per center vertex via the motif pattern API
    * (GraphFrames `g.find`, the reference library's signature query
    * surface): paths a→b→c with a ≠ c and NO closing a—c edge. The
    * negated term compiles to a left-anti join; the whole query is a
    * three-way join chain Catalyst plans like hand-written SQL.
    *
    * Scoped to the small-parts induced subgraph (the same filter as
    * g_induced_subgraph): a wedge pattern materializes Σ deg² rows —
    * ~3×10⁸ on the full sf0.1 graph — so production motif queries run
    * on a filtered subgraph, exactly how GraphFrames users scope
    * `find`. The vertex filter is two semi-joins that Catalyst pushes
    * ahead of the pattern joins. */
  def motifOpenWedges(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val keep = Tables(spark, dir).part
      .filter(col("p_size") <= 10)
      .select(col("p_partkey").as("id"))
    val sub = Graph(keep, g.inducedSubgraphEdges(keep))
    Motif.find(sub, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
      .filter(col("a") =!= col("c"))
      .groupBy(col("b").as("id"))
      .agg(count(lit(1)).as("open_wedges"))
      .orderBy("id")
  }

  /** DOT export of the community-sample induced subgraph — the
    * engine-side analog of the reference's sampled-graph plot artifact
    * (main.py:200-206): portable text any Graphviz front-end renders.
    * Rides the session-cached sample + induced-edge tables. */
  def sampleExportDot(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val sampled = CommunitySample.sample(spark, g)
      .select(col("id")).distinct()
    val sub = Graph(sampled, g.inducedSubgraphEdges(sampled))
    GraphExport.dotLines(sub).orderBy("section", "k1", "k2")
  }

  /** The classic `aggregateMessages` example from the GraphFrames docs:
    * max degree among each vertex's neighbors — exercised through the
    * public Graph.aggregateMessages API (message Columns over the
    * triplet view, both directions on the undirected edge set). */
  def maxNeighborDegree(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    g.aggregateMessages(g.degrees,
        msgToSrc = Some(col("dst_degree")),
        msgToDst = Some(col("src_degree")),
        agg = max)
      .select(col("id"), col("agg_msg").as("max_nbr_degree"))
      .orderBy("id")
  }

  /** Average neighbor degree (nx.average_neighbor_degree — the
    * reference's metric library): mean degree over each vertex's
    * neighborhood, via the same aggregateMessages surface —
    * avg is a map-side-combinable (sum, count) pair. */
  def avgNeighborDegree(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    g.aggregateMessages(g.degrees,
        msgToSrc = Some(col("dst_degree")),
        msgToDst = Some(col("src_degree")),
        agg = m => round(avg(m), 4))
      .select(col("id"), col("agg_msg").as("avg_nbr_degree"))
      .orderBy("id")
  }

  /** GraphSAGE-style neighborhood feature aggregation: per vertex, the
    * mean and max of its neighbors' part retail price — the 1-hop
    * aggregate feature a graph-ML pipeline exports per node (mean/max
    * are SAGE's standard aggregators). One symmetrized join + one
    * map-side-combined aggregate; the price sum runs in exact cents
    * (2-dp money → exact longs), so the mean is partition-order-free.
    * Generalizes to any vertex attribute column unchanged. */
  def neighborFeatures(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val feat = Tables(spark, dir).part
      .select(col("p_partkey").as("dst"), col("p_retailprice").as("f"))
    g.symmetrized.join(feat, "dst")
      .groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("n_nbrs"),
        sum(round(col("f") * 100).cast("long")).as("cents"),
        max(col("f")).as("max_nbr_price"))
      .select(col("id"), col("n_nbrs"),
        round(col("cents") / (col("n_nbrs") * 100.0), 4)
          .as("avg_nbr_price"),
        col("max_nbr_price"))
      .orderBy("id")
  }

  /** Distance histogram from the session's 8 BFS landmarks: count of
    * (landmark, vertex) pairs at each hop distance — the small-world
    * check (mass concentrates at 3-6 hops) off the already-memoized
    * landmark BFS; zero new traversals. */
  def distanceHistogram(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    GraphBuilder.landmarkBfs(g, 8)
      .groupBy(col("dist")).agg(count(lit(1)).as("n_pairs"))
      .orderBy("dist")
  }

  /** Degree-correlation function knn(k) (Pastor-Satorras et al. 2001):
    * mean average-neighbor-degree over the vertices OF each degree k —
    * the one-row-per-degree summary whose slope is the assortativity
    * read directly (rising = assortative, falling = disassortative).
    * Reuses the same per-vertex neighbor-degree aggregate as
    * [[avgNeighborDegree]]; the outer mean accumulates the 4-dp inner
    * values as exact 1e-4-unit integers (micro-int idiom) so the outer
    * rounding cannot flip with summation order. */
  def knnByDegree(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val perVertex = g.aggregateMessages(g.degrees,
        msgToSrc = Some(col("dst_degree")),
        msgToDst = Some(col("src_degree")),
        agg = m => round(avg(m), 4))
      .select(col("id"),
        round(col("agg_msg") * 1e4).cast("long").as("andu"))
    g.degrees.join(perVertex, "id")
      .groupBy("degree")
      .agg(count(lit(1)).as("n_vertices"),
        round(sum(col("andu")) / count(lit(1)) / 1e4, 4).as("knn"))
      .orderBy("degree")
  }

  /** Temporal graph evolution: per month, the number of co-purchase
    * edges appearing for the FIRST time, plus the running cumulative —
    * the growth curve of a streaming/temporal graph (densification
    * analysis, Leskovec et al. 2005). Each edge's arrival month is a
    * min-aggregate over its order months; the monthly rollup is tiny
    * (≈80 rows), so the cumulative window's single-partition sort is
    * over the AGGREGATE, never the data. */
  /** First-arrival month per co-purchase edge — (src, dst, month) with
    * month = min over the orders the pair co-occurs in. ONE session
    * memo (r12) shared by [[edgeArrival]] and [[densification]]: each
    * used to compute this same pair-scale table independently
    * (edgeArrival via the sorted collect_list pair explode below,
    * densification via a lineitem self-join — identical result sets:
    * same src<dst pair universe, same per-pair min month), i.e. two
    * full pair-table builds per session where one suffices. The memo is
    * the pair-explode formulation: one shuffle keyed (orderkey, month)
    * + map-side pair generation, no self-join of lineitem. Attributed
    * as the `first_seen_edges` shared-build line in Bench. */
  private val firstSeenCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private[graft] def coPurchaseFirstSeen(spark: SparkSession,
                                         dir: String): DataFrame =
    firstSeenCache.getOrElseUpdate(graft.GraftSession.sessionKey(spark, dir), {
      val t = graft.Tables(spark, dir)
      val pe = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
        .join(t.orders.select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("m")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "m")
        .agg(sort_array(collect_list("l_partkey")).as("ps"))
        .select(col("m"), col("ps"), posexplode(col("ps")).as(Seq("i", "src")))
        .select(col("m"), col("src"),
          explode(slice(col("ps"), col("i") + 2, size(col("ps")))).as("dst"))
        .filter(col("src") < col("dst"))
      graft.Materialize.table(
        pe.groupBy("src", "dst").agg(min("m").as("month")))
    })

  def edgeArrival(spark: SparkSession, dir: String): DataFrame = {
    val monthly = coPurchaseFirstSeen(spark, dir).groupBy("month")
      .agg(count(lit(1)).as("new_edges"))
    val w = Window.orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .select(col("month"), col("new_edges"),
        sum("new_edges").over(w).as("cum_edges"))
      .orderBy("month")
  }

  /** Densification law (Leskovec–Kleinberg–Faloutsos): growing graphs
    * obey e(t) ∝ n(t)^a with a ∈ (1,2) — edges grow superlinearly in
    * vertices. Reports the fitted exponent: cumulative vertex/edge
    * counts per arrival month (first co-purchase date), then the
    * least-squares slope of ln e on ln n. The regression runs on
    * 1e-6-quantized ln values with EXACT integer sums (n·Σxy − Σx·Σy
    * over longs — safe to ~300 months before needing a wider type),
    * so the slope is partition-order-free and SQL-replayable. Monthly
    * table is tiny at any SF (bounded by calendar span, not data). */
  def densification(spark: SparkSession, dir: String): DataFrame = {
    // r12: the first-seen table is the shared [[coPurchaseFirstSeen]]
    // session memo (edgeArrival consumes the same table) — the
    // query-local lineitem self-join + scoped cache that rebuilt it
    // per call is gone; both branches below read the memo leaf.
    val fs = coPurchaseFirstSeen(spark, dir)
      .select(col("src"), col("dst"), col("month").as("em"))
    val vm = fs.select(col("src").as("id"), col("em"))
      .union(fs.select(col("dst").as("id"), col("em")))
      .groupBy("id").agg(min("em").as("vm"))
      .groupBy(col("vm").as("month")).agg(count(lit(1)).as("nv"))
    val emo = fs.groupBy(col("em").as("month"))
      .agg(count(lit(1)).as("ne"))
    val w = Window.orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = emo.join(vm, Seq("month"), "left").na.fill(0L, Seq("nv"))
      .select(col("month"), sum("nv").over(w).as("vcum"),
        sum("ne").over(w).as("ecum"))
      .select(round(log(col("vcum")) * 1e6).cast("long").as("x"),
        round(log(col("ecum")) * 1e6).cast("long").as("y"),
        col("vcum"), col("ecum"))
    cum.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        max("vcum").as("final_vertices"), max("ecum").as("final_edges"))
      .select(col("n").as("n_months"), col("final_vertices"),
        col("final_edges"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")), 4)
          .as("densification_exponent"))
  }

  /** In/out degrees of the directed purchase-sequence graph
    * (GraphFrames `inDegrees` / `outDegrees` parity — the undirected
    * co-purchase graph can't distinguish them). */
  def directedDegrees(spark: SparkSession, dir: String): DataFrame = {
    val e = Scc.lineSequenceEdges(spark, dir)
    val outD = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_degree"))
    val inD = e.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("in_degree"))
    val v = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    v.join(inD, Seq("id"), "left")
      .join(outD, Seq("id"), "left")
      .na.fill(0L, Seq("in_degree", "out_degree"))
      .select("id", "in_degree", "out_degree")
      .orderBy("id")
  }

  /** Path-returning BFS (GraphFrames `bfs(fromExpr, toExpr)` parity):
    * canonical min-parent shortest paths from the top-degree vertex to
    * the 10 farthest reachable vertices. Rides the session-cached
    * landmark BFS table (landmark #1 IS the top-degree vertex). */
  def bfsPaths(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val src = Iterative.topDegreeLandmarks(g, 1).head().getLong(0)
    Iterative.bfsPaths(g, GraphBuilder.landmarkBfs(g, 8), src, k = 10)
      .orderBy("id")
  }

  /** Strongly connected components of the directed purchase-sequence
    * graph — GraphFrames `stronglyConnectedComponents` parity, the one
    * library API surface an undirected graph can't exercise. Labels are
    * canonical (min member id), so the result is algorithm-independent
    * and hash-checks against a transitive-closure oracle. */
  def scc(spark: SparkSession, dir: String): DataFrame =
    Scc.labels(spark, dir).orderBy("id")

  /** SCC size histogram — the giant-SCC / periphery structure of the
    * directed graph (the bow-tie picture at a glance). */
  /** Edge reciprocity of the directed purchase-sequence graph
    * (nx.reciprocity): the fraction of directed edges whose reverse
    * edge also exists — one self-semi-join on the (small, cached)
    * directed edge set plus two counts. */
  def reciprocity(spark: SparkSession, dir: String): DataFrame = {
    val e = Scc.lineSequenceEdges(spark, dir)
    val recip = e.join(
      e.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    e.agg(count(lit(1)).as("m")).crossJoin(
        recip.agg(count(lit(1)).as("r")))
      .select(col("m").as("n_edges"), col("r").as("n_reciprocal"),
        round(col("r") / col("m"), 6).as("reciprocity"))
  }

  def sccSizes(spark: SparkSession, dir: String): DataFrame =
    Scc.labels(spark, dir)
      .groupBy("scc_id").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_sccs"))
      .orderBy("size")

  /** Induced subgraph over a deterministic vertex subset: small parts
    * (p_size <= 10). (ref main.py:192-195 — but linear, not |V|².) */
  def inducedSubgraph(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val keep = Tables(spark, dir).part
      .filter(col("p_size") <= 10)
      .select(col("p_partkey").as("id"))
    g.inducedSubgraphEdges(keep).orderBy("src", "dst")
  }

  /** Link prediction: top-k NON-adjacent vertex pairs by Adamic–Adar
    * score (Σ 1/ln deg(w) over common neighbors w), scoped to the same
    * attribute-sampled subgraph as [[inducedSubgraph]] — wedge
    * enumeration over the full co-purchase graph is Σ deg² (the dense
    * band makes degree-capping useless here: min degree ≈ 40), while
    * the sampled subgraph thins wedge fan-out quadratically. Degrees in
    * the score are FULL-graph degrees (the feature stays honest; the
    * sample only bounds the candidate set). Pairs tie-break (score
    * desc, src, dst) so the top-k is engine-deterministic. */
  def linkPrediction(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val keep = Tables(spark, dir).part
      .filter(col("p_size") <= 10)
      .select(col("p_partkey").as("id"))
    val se = g.symmetrized
      .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
    val wedge = se.select(col("src").as("w"), col("dst").as("u"))
      .join(se.select(col("src").as("w"), col("dst").as("v")), "w")
      .filter(col("u") < col("v"))
    val scored = wedge
      .join(g.degrees.withColumnRenamed("id", "w"), "w")
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_cnt"),
        round(sum(lit(1.0) / log(col("degree"))), 6).as("aa_score"))
    scored
      .join(g.edges.select(col("src").as("u"), col("dst").as("v")),
        Seq("u", "v"), "left_anti")
      .select(col("u").as("src"), col("v").as("dst"),
        col("common_cnt"), col("aa_score"))
      .orderBy(col("aa_score").desc, col("src").asc, col("dst").asc)
      .limit(k)
  }

  /** TEMPORAL link-prediction evaluation — the honest version of
    * [[linkPrediction]]: train Adamic–Adar on the graph as it existed
    * before `splitDate` (first co-purchase date per canonical edge),
    * predict the top-k non-adjacent pairs, and score precision@k
    * against the edges that actually ARRIVED after the split — plus
    * the random-candidate baseline, so the lift is visible. This is
    * the standard evaluation protocol (Liben-Nowell–Kleinberg); the
    * static variant can only rank, never validate.
    *
    * Scale: the wedge enumeration reuses link_prediction's small-parts
    * gate (Σ deg² bound); the split is a pushed-down date predicate on
    * the first-seen table; the result is ONE row of exact-integer
    * counts with two rounded divisions. */
  def linkTemporalEval(spark: SparkSession, dir: String, k: Int = 50,
                       splitDate: String = "1996-01-01"): DataFrame = {
    val t = graft.Tables(spark, dir)
    val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
    // query-local scope: the first-seen table feeds both split sides
    // and the anti-join — uncached, the full lineitem pair scan re-ran
    // per consumer (measured ~2× the query's cost at sf0.1); sealed
    // (freed) once the 1-row report is computed, so neither it nor the
    // candidate-score table leaks cached blocks past this query
    val scope = new graft.Materialize.Scoped
    val fs = scope.table(li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("a.l_orderkey") === col("o_orderkey"))
      .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .agg(min(col("o_orderdate")).as("fd")))
    val cut = lit(splitDate).cast("timestamp")
    val ee = fs.filter(col("fd") < cut).select("src", "dst")
    val le = fs.filter(col("fd") >= cut).select("src", "dst")
    val esym = ee.union(ee.select(col("dst").as("src"), col("src").as("dst")))
    val edeg = esym.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("degree"))
    val keep = t.part.filter(col("p_size") <= 10)
      .select(col("p_partkey").as("id"))
    val se = esym.join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
    val sc = scope.table(se.select(col("src").as("w"), col("dst").as("u"))
      .join(se.select(col("src").as("w"), col("dst").as("v")), "w")
      .filter(col("u") < col("v"))
      .join(edeg.withColumnRenamed("id", "w"), "w")
      .groupBy("u", "v")
      .agg(round(sum(lit(1.0) / log(col("degree"))), 6).as("aa"))
      .join(ee.select(col("src").as("u"), col("dst").as("v")),
        Seq("u", "v"), "left_anti"))
    val lev = le.select(col("src").as("u"), col("dst").as("v"))
    val nCand = sc.count()
    val nLate = le.count()
    val candHits = sc.join(lev, Seq("u", "v"), "left_semi").count()
    scope.seal(
      sc.orderBy(col("aa").desc, col("u"), col("v")).limit(k)
        .join(lev.withColumn("h", lit(1)), Seq("u", "v"), "left")
        .agg(count(col("h")).as("hits"))
        .select(lit(k).as("k"), lit(nCand).as("n_candidates"),
          lit(nLate).as("n_late_new"), col("hits"),
          round(col("hits") / (k * 1.0), 4).as("precision_at_k"),
          round(lit(candHits) / (lit(nCand) * 1.0), 6).as("random_baseline")))
  }

  /** Fixed-iteration Katz centrality — see [[Gx.katz]]. */
  def katz(spark: SparkSession, dir: String): DataFrame =
    Gx.katz(GraphBuilder.coPurchase(spark, dir)).orderBy("id")

  /** Fixed-iteration eigenvector centrality — see [[Gx.eigenvector]]. */
  def eigenvectorCentrality(spark: SparkSession, dir: String): DataFrame =
    Gx.eigenvector(GraphBuilder.coPurchase(spark, dir)).orderBy("id")

  /** HITS hubs/authorities on the directed purchase-sequence graph —
    * see [[Hits.hits]]. */
  def hits(spark: SparkSession, dir: String): DataFrame =
    Hits.hits(Scc.lineSequenceEdges(spark, dir)).orderBy("id")

  /** SALSA authorities/hubs on the directed purchase-sequence graph —
    * closed-form stationary scores (one CC + two aggregations, no
    * power iteration), see [[Hits.salsa]]. */
  def salsa(spark: SparkSession, dir: String): DataFrame =
    Hits.salsa(Scc.lineSequenceEdges(spark, dir))

  /** Normalized degree centrality — see [[Metrics.degreeCentrality]]. */
  def degreeCentrality(spark: SparkSession, dir: String): DataFrame =
    Metrics.degreeCentrality(GraphBuilder.coPurchase(spark, dir)).orderBy("id")

  /** Per-edge Adamic–Adar link-prediction index — see
    * [[Graph.adamicAdar]]. */
  def adamicAdar(spark: SparkSession, dir: String): DataFrame =
    GraphBuilder.coPurchase(spark, dir).adamicAdar.orderBy("src", "dst")

  /** Local bridges (edges with no common neighbor) — see
    * [[Metrics.localBridges]]. */
  def localBridges(spark: SparkSession, dir: String): DataFrame =
    Metrics.localBridges(GraphBuilder.coPurchase(spark, dir))
      .orderBy("src", "dst")

  /** Rich-club coefficient curve — see [[Metrics.richClub]]. */
  def richClub(spark: SparkSession, dir: String): DataFrame =
    Metrics.richClub(GraphBuilder.coPurchase(spark, dir))

  /** Global 4-clique count — see [[Graph.clique4Count]]. The natural
    * next rung of the clique ladder after [[triangles]]; a K4-dense
    * graph is the signature of the order-clique construction, so the
    * count is a structural fingerprint the triangle count can't see. */
  def clique4(spark: SparkSession, dir: String): DataFrame =
    GraphBuilder.coPurchase(spark, dir).clique4Count

  /** Per-community conductance over the session-cached LPA labels:
    * cut(c) = edges with exactly one endpoint in c, vol(c) = Σ degree,
    * φ(c) = cut / min(vol, 2|E| − vol) — the standard community-
    * quality score next to [[modularity]]. One edge→label join (the
    * canonical co-partitioned shuffle), one label→degree join, then
    * community-keyed aggregates; the 2|E| total is a 1-row crossJoin,
    * never a collect. */
  def communityConductance(spark: SparkSession, dir: String): DataFrame =
    conductance(GraphBuilder.coPurchase(spark, dir),
      GraphBuilder.communities(spark, GraphBuilder.coPurchase(spark, dir)))

  /** Conductance core over any (id, community) labeling — spec-driven
    * directly on hand-labeled graphs. */
  def conductance(g: Graph, labels: DataFrame): DataFrame = {
    val withC = g.edges.select("src", "dst")
      .join(labels.select(col("id").as("src"), col("community").as("ca")), "src")
      .join(labels.select(col("id").as("dst"), col("community").as("cb")), "dst")
    val cut = withC.filter(col("ca") =!= col("cb"))
      .select(explode(array(col("ca"), col("cb"))).as("community"))
      .groupBy("community").agg(count(lit(1)).as("cut_edges"))
    val vol = labels.join(g.degrees, "id")
      .groupBy("community")
      .agg(count(lit(1)).as("n_vertices"), sum("degree").as("volume"))
    val tot = vol.agg(sum("volume").as("vt"))
    vol.join(cut, Seq("community"), "left")
      .na.fill(0L, Seq("cut_edges"))
      .crossJoin(tot)
      .select(col("community"), col("n_vertices"), col("cut_edges"),
        col("volume"),
        round(when(least(col("volume"), col("vt") - col("volume")) === 0, 0.0)
          .otherwise(col("cut_edges") /
            least(col("volume"), col("vt") - col("volume"))), 6)
          .as("conductance"))
      .orderBy("community")
  }

  /** Attribute (community) assortativity coefficient
    * (nx.attribute_assortativity_coefficient over the LPA labels):
    * r = (Σᵢ eᵢᵢ − Σᵢ aᵢ·bᵢ) / (1 − Σᵢ aᵢ·bᵢ) on the edge-endpoint
    * mixing matrix — how strongly edges stay inside communities,
    * normalized against chance. Exact longs until the final division:
    * with M = 2|E| directed endpoints, r = (M·Σ2eᵢᵢᵈ − Σ(aᵢᵈ)²) /
    * (M² − Σ(aᵢᵈ)²) where eᵢᵢᵈ counts ordered intra-community edges
    * and aᵢᵈ the ordered endpoint counts (the symmetric matrix makes
    * aᵢ = bᵢ). One edge→label join + two tiny aggregates. */
  def communityAssortativity(spark: SparkSession, dir: String): DataFrame =
    attributeAssortativity(GraphBuilder.coPurchase(spark, dir),
      GraphBuilder.communities(spark,
        GraphBuilder.coPurchase(spark, dir)))

  /** Assortativity core over any (id, community) labeling. */
  def attributeAssortativity(g: Graph, labels: DataFrame): DataFrame = {
    val withC = g.edges.select("src", "dst")
      .join(labels.select(col("id").as("src"), col("community").as("ca")), "src")
      .join(labels.select(col("id").as("dst"), col("community").as("cb")), "dst")
    // ordered (both directions): intra count and per-community endpoint count
    val intra = withC.agg(
      (sum(when(col("ca") === col("cb"), 2L).otherwise(0L))).as("intra2"),
      count(lit(1)).as("m"))
    val margin = withC
      .select(explode(array(col("ca"), col("cb"))).as("c"))
      .groupBy("c").agg(count(lit(1)).as("a"))
      .agg(sum(col("a") * col("a")).as("sum_a2"))
    val den = (col("m") * 2) * (col("m") * 2) - col("sum_a2")
    intra.crossJoin(margin)
      .select((col("m") * 2).as("endpoints"), col("intra2").as("intra_endpoints"),
        col("sum_a2"),
        // single-community degenerate case: denominator 0 ⇒ define r=0
        when(den === 0, lit(0.0)).otherwise(
          round(((col("m") * 2) * col("intra2") - col("sum_a2"))
            .cast("double") / den, 6)).as("assortativity"))
  }

  /** Global 4-cycle count — see [[Graph.squareCount]]. */
  def squareCount(spark: SparkSession, dir: String): DataFrame =
    GraphBuilder.coPurchase(spark, dir).squareCount

  /** Dyad census of the directed purchase-sequence graph
    * (nx.dyadic census semantics: holland-leinhardt M/A/N counts):
    * mutual = unordered pairs linked in both directions, asym = pairs
    * linked one way, nulld = unlinked pairs among the C(n,2) dyads.
    * One groupBy on the canonicalized pair (the directed edge set is
    * distinct, so the per-pair direction count is 1 or 2) plus the
    * cached vertex count — no pair materialization for the nulls. */
  def dyadCensus(spark: SparkSession, dir: String): DataFrame = {
    val e = Scc.lineSequenceEdges(spark, dir)
    val pairDirs = e.select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("ndir"))
    val v = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    pairDirs.agg(
        sum(when(col("ndir") === 2, 1L).otherwise(0L)).as("mutual"),
        sum(when(col("ndir") === 1, 1L).otherwise(0L)).as("asym"))
      .crossJoin(v.agg(count(lit(1)).as("n")))
      .select(col("n").as("n_vertices"), col("mutual"), col("asym"),
        // integral `div`, matching the oracle's exact `//`: Column./
        // is double division, which loses exactness once n·(n−1)
        // exceeds 2⁵³ (~9.5e7 vertices) and would diverge from DuckDB
        (expr("n * (n - 1) div 2") - col("mutual") - col("asym"))
          .cast("long").as("nulld"))
  }

  /** Shannon entropy of the degree distribution (+ normalized by
    * log2 k) — the one-number heterogeneity summary next to
    * [[powerlawAlpha]]: lattice-like graphs score near 0, scale-free
    * graphs high. Same order-free discipline as the cluster/token
    * entropies: each histogram row's p·log2 p term quantizes to an
    * exact 1e-6 long before the sum, so partial-agg order cannot move
    * the rounded result. Cost: rides the (session-cached) degree
    * table; the histogram is O(distinct degrees) ~ O(sqrt |E|) rows. */
  def degreeEntropy(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val hist = g.degrees.groupBy("degree").agg(count(lit(1)).as("cnt"))
    val t = hist.agg(sum("cnt").as("tot"), count(lit(1)).as("k"))
    val p = col("cnt") / col("tot").cast("double")
    hist.crossJoin(broadcast(t))
      .select(col("k"), col("tot"),
        round(p * log2(p) * 1e6).cast("long").as("u"))
      .groupBy()
      .agg(max("k").as("n_degree_values"),
        max("tot").as("n_vertices"),
        round(-sum(col("u")) / 1e6, 6).as("degree_entropy"),
        round(-sum(col("u")) / 1e6 /
          log2(max("k").cast("double")), 6).as("norm_entropy"))
  }

  /** Bow-tie decomposition of the directed purchase-sequence graph
    * (Broder et al., "Graph structure in the Web"): anchored at the
    * deterministic max-degree pivot, SCC = forward ∩ backward reachable
    * set, IN = reaches the core, OUT = reached from the core, OTHER =
    * neither. Result is a ≤4-row region histogram.
    *
    * REWORK r8: the two sweeps are GraphX Pregel flag propagations
    * over ONE cached directed graph. The r8-original DataFrame frontier
    * loop paid persist+count+flatten per BFS round — 80.6 s at sf0.1,
    * the suite's top line — while a Pregel superstep is one
    * aggregateMessages over the cached, co-partitioned edge RDD;
    * message volume is frontier-incident either way, but the per-round
    * fixed cost drops ~50×. Forward spreads along Out edges, backward
    * along In edges of the SAME graph (no reversed-edge copy). */
  def bowtie(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.graphx.{Edge, EdgeDirection, Graph => XGraph, Pregel}
    import org.apache.spark.storage.StorageLevel
    import spark.implicits._
    val eDf = Scc.lineSequenceEdges(spark, dir)
    val scope = new graft.Materialize.Scoped
    val deg = scope.table(
      eDf.select(col("src").as("id")).union(eDf.select(col("dst").as("id")))
        .groupBy("id").agg(count(lit(1)).as("degree")))
    // TakeOrdered top-1, never a global sort
    val pivot = deg.orderBy(col("degree").desc, col("id")).limit(1)
      .collect()(0).getLong(0)
    val parts = math.max(2L, eDf.count() / 250000L + 1L).toInt
    val ed = eDf.select("src", "dst").as[(Long, Long)].rdd
      .map { case (s, d) => Edge(s, d, 0) }
    val sized = if (ed.getNumPartitions > parts) ed.coalesce(parts) else ed
    val xg = XGraph.fromEdges(sized, false,
      StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
      .mapVertices((id, _) => id == pivot)
      .persist(StorageLevel.MEMORY_AND_DISK)
    def sweep(forward: Boolean): DataFrame = {
      val res = Pregel(xg, false,
        activeDirection =
          if (forward) EdgeDirection.Out else EdgeDirection.In)(
        (_, attr, msg) => attr || msg,
        t =>
          if (forward) {
            if (t.srcAttr && !t.dstAttr) Iterator((t.dstId, true))
            else Iterator.empty
          } else {
            if (t.dstAttr && !t.srcAttr) Iterator((t.srcId, true))
            else Iterator.empty
          },
        _ || _)
      val out = scope.table(
        res.vertices.filter(_._2).keys.toDF("id"))
      res.unpersistVertices(blocking = false)
      res.edges.unpersist(blocking = false)
      out
    }
    val fwd = sweep(true)
    val bwd = sweep(false)
    val out = scope.seal(deg.select("id")
      .join(fwd.select(col("id"), lit(1).as("f")), Seq("id"), "left")
      .join(bwd.select(col("id"), lit(1).as("b")), Seq("id"), "left")
      .select(when(col("f").isNotNull && col("b").isNotNull, "scc")
        .when(col("b").isNotNull, "in")
        .when(col("f").isNotNull, "out")
        .otherwise("other").as("region"))
      .groupBy("region").agg(count(lit(1)).as("n_vertices"))
      .orderBy("region"))
    xg.unpersistVertices(blocking = false)
    xg.edges.unpersist(blocking = false)
    out
  }

  /** Customer projection of the customer–part bipartite graph:
    * customers linked by shared purchased parts, edge weight = shared
    * part count, reported as the weight histogram. The per-part
    * customer cap (≤ `cap` distinct buyers) is the standard bipartite-
    * projection hub guard: it bounds the self-join fanout at
    * C(cap, 2) per part — WITHOUT it a single part bought by 10⁶
    * customers emits 5·10¹¹ pairs, the classic 100 TB projection
    * killer. One distinct-incidence build, one capped part-keyed
    * self-join, two bounded aggregates. */
  def customerProjection(spark: SparkSession, dir: String,
                         cap: Int = 25): DataFrame = {
    val t = graft.Tables(spark, dir)
    val inc = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(t.orders.select(col("o_orderkey").as("l_orderkey"),
        col("o_custkey")), "l_orderkey")
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
    val partCnt = inc.groupBy("part").agg(count(lit(1)).as("nc"))
    val keep = inc.join(partCnt.filter(col("nc") <= cap).select("part"),
      Seq("part"), "left_semi")
    keep.select(col("part"), col("cust").as("a"))
      .join(keep.select(col("part"), col("cust").as("b")), Seq("part"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_pairs"))
      .orderBy("w")
  }

  /** Gini coefficient of the degree distribution — the
    * hub-concentration scalar next to [[degreeEntropy]] and the
    * power-law alpha (0 = perfectly even, →1 = a few hubs own all
    * edges).
    *
    * Computed EXACTLY from the degree histogram with the tie-grouped
    * rank formula: for a run of c equal values v starting at global
    * rank s, Σ i·vᵢ contributes v·(c·s + c·(c−1)/2) — all integer
    * until the final division. The window runs over the HISTOGRAM
    * (≤ max-degree rows, the bounded-table precedent of
    * degree_histogram), never the |V|-row degree table. */
  def degreeGini(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val hist = g.degrees.groupBy("degree").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("degree")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum_c", sum("c").over(w))
      .withColumn("s", col("cum_c") - col("c") + 1)
      .select(col("degree"), col("c"),
        // integer `div` keeps u a long (c·(c−1) is always even)
        expr("degree * (c * s + (c * (c - 1)) div 2)").as("u"))
    cum.agg(sum("c").as("n"), sum(col("degree") * col("c")).as("s1"),
      sum("u").as("s2"))
      .select(col("n").as("n_vertices"),
        round(col("s2") * 2 / (col("n") * col("s1")).cast("double") -
          (col("n") + 1) / col("n").cast("double"), 6).as("degree_gini"))
  }

  /** Joint degree distribution: for every undirected edge, the
    * (⌊log₂ deg(u)⌋, ⌊log₂ deg(v)⌋) bucket pair (low, high) — the
    * degree-mixing matrix behind assortativity, readable as "do hubs
    * link to hubs or to leaves". Buckets come from the BINARY STRING
    * length (length(bin(d))−1), not a float log₂, so bucket edges at
    * powers of two are exact in any engine.
    *
    * Scale shape: two id-keyed joins of edges against the cached
    * degree table, then a ≤(log₂ maxdeg)²-cell aggregate — the same
    * plan family as assortativity. */
  def jointDegree(spark: SparkSession, dir: String): DataFrame = {
    val g = GraphBuilder.coPurchase(spark, dir)
    val deg = g.degrees
    val bucket = (c: org.apache.spark.sql.Column) => (length(bin(c)) - 1).cast("int")
    g.edges.select(col("src"), col("dst"))
      .join(deg.select(col("id").as("src"), bucket(col("degree")).as("bu")), Seq("src"))
      .join(deg.select(col("id").as("dst"), bucket(col("degree")).as("bv")), Seq("dst"))
      .select(least(col("bu"), col("bv")).as("bucket_lo"),
        greatest(col("bu"), col("bv")).as("bucket_hi"))
      .groupBy("bucket_lo", "bucket_hi")
      .agg(count(lit(1)).as("n_edges"))
      .orderBy("bucket_lo", "bucket_hi")
  }

  /** Induced 4-node graphlet census: exact counts of the six connected
    * 4-vertex induced subgraphs — path (P4), claw (K1,3), cycle (C4),
    * paw (triangle + pendant), diamond (K4 minus an edge), clique (K4)
    * — the structural fingerprint one rung above the triad census.
    *
    * No 4-set is ever enumerated. The six induced counts are recovered
    * in CLOSED FORM from five primitive counts the engine already
    * maintains (the PGD / Ahmed et al. 2015 inclusion–exclusion):
    * per-vertex (degree, triangles), per-edge common-neighbor counts,
    * the 4-cycle count and the 4-clique count. With T = triangles,
    * non-induced claw_n = Σᵥ C(deg,3), paw_n = Σᵥ tri(v)·(deg−2),
    * p4_n = Σₑ (deg(u)−1)(deg(v)−1) − 3T, diamond_n = Σₑ C(cn(e),2):
    *   clique  = k4
    *   diamond = diamond_n − 6·k4           (a K4 holds 6 diamonds)
    *   cycle   = sq − diamond − 3·k4
    *   paw     = paw_n − 4·diamond − 12·k4
    *   claw    = claw_n − paw − 2·diamond − 4·k4
    *   path    = p4_n − 4·cycle − 2·paw − 6·diamond − 12·k4
    * (coefficients = how many copies of the sparser pattern each denser
    * induced graphlet contains; verified against a brute-force induced
    * classifier in GraphletCensusSpec.)
    *
    * Scale: every input is a 1-row aggregate of an already-memoized
    * table (triangle/common-neighbor streams, squareCount, clique4Count
    * — each with its own documented 100 TB path); the census itself
    * adds two broadcast-gated degree joins and five map-side-combined
    * global sums. Exact longs throughout; claw_n ≈ Σ deg³/6 is the
    * binding overflow bound (safe through max-degree ~10⁶ hubs). */
  def graphletCensus(spark: SparkSession, dir: String): DataFrame =
    graphletCensusOf(GraphBuilder.coPurchase(spark, dir))

  /** Census core over any [[Graph]] — spec-driven on hand-built and
    * random graphs against the brute-force induced classifier. */
  def graphletCensusOf(g: Graph): DataFrame = {
    val tvd = g.triangleVertexCounts
    val base = tvd.agg(
      coalesce(expr("sum(triangles) div 3"), lit(0L)).as("t3"),
      coalesce(sum(expr("degree * (degree - 1) * (degree - 2) div 6")),
        lit(0L)).as("claw_n"),
      coalesce(sum(col("triangles") * (col("degree") - 2)), lit(0L))
        .as("paw_n"))
    val deg = if (g.vertexCount <= Graph.broadcastVertexGate) broadcast(g.degrees) else g.degrees
    val p4e = g.edges.select("src", "dst")
      .join(deg.select(col("id").as("src"), col("degree").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("degree").as("dv")), "dst")
      .agg(coalesce(sum((col("du") - 1) * (col("dv") - 1)), lit(0L))
        .as("p4_ext"))
    val dn = g.edgeCommonStats
      .agg(coalesce(sum(expr("common * (common - 1) div 2")), lit(0L))
        .as("diamond_n"))
    base.crossJoin(p4e).crossJoin(dn)
      .crossJoin(g.squareCount).crossJoin(g.clique4Count)
      .select(col("t3"), col("claw_n"), col("paw_n"),
        (col("p4_ext") - lit(3) * col("t3")).as("p4_n"),
        col("diamond_n"), col("square_count").as("sq"),
        col("clique4_count").as("k4"))
      .select(col("*"), (col("diamond_n") - lit(6) * col("k4")).as("di"))
      .select(col("*"),
        (col("sq") - col("di") - lit(3) * col("k4")).as("c4i"),
        (col("paw_n") - lit(4) * col("di") - lit(12) * col("k4")).as("pawi"))
      .select(col("*"),
        (col("claw_n") - col("pawi") - lit(2) * col("di") - lit(4) * col("k4"))
          .as("clawi"),
        (col("p4_n") - lit(4) * col("c4i") - lit(2) * col("pawi")
          - lit(6) * col("di") - lit(12) * col("k4")).as("p4i"))
      .select(explode(array(
        struct(lit("1_path4").as("graphlet"), col("p4i").as("n")),
        struct(lit("2_claw").as("graphlet"), col("clawi").as("n")),
        struct(lit("3_cycle4").as("graphlet"), col("c4i").as("n")),
        struct(lit("4_paw").as("graphlet"), col("pawi").as("n")),
        struct(lit("5_diamond").as("graphlet"), col("di").as("n")),
        struct(lit("6_clique4").as("graphlet"), col("k4").as("n")))).as("g"))
      .select(col("g.graphlet").as("graphlet"), col("g.n").as("n"))
      .orderBy("graphlet")
  }
}
