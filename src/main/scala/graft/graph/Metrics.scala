package graft.graph


import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Additional whole-graph and per-edge SNA metrics beyond the
  * reference's direct surface — standard companions in any SNA toolkit,
  * each expressed as shuffle-minimal DataFrame algebra.
  */
object Metrics {

  /** Graph density 2m / n(n−1). */
  def density(g: Graph): DataFrame = {
    val m = g.edges.count().toDouble
    val n = g.vertices.count().toDouble
    g.edges.sparkSession.range(1).select(
      round(lit(2.0 * m / (n * (n - 1))), 8).as("density"))
  }

  /** Degree centrality (nx.degree_centrality): degree / (n−1) — the
    * normalized form the NetworkX metric family reports. One projection
    * over the cached degree table; n is the graph's memoized vertex
    * count (no extra job). */
  def degreeCentrality(g: Graph): DataFrame = {
    val n = g.vertexCount
    g.degrees.select(col("id"),
      round(col("degree") / lit((n - 1).toDouble), 6).as("degree_centrality"))
  }

  /** Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) for every k in
    * 0..maxDegree−1 (nx.rich_club_coefficient, unnormalized): N_k =
    * vertices with degree > k, E_k = edges with BOTH endpoints of
    * degree > k (equivalently min endpoint degree > k).
    *
    * Scale shape: both counts are cumulative sums over DEGREE-domain
    * aggregates — the degree histogram and the per-edge min-degree
    * histogram — each at most maxDegree rows no matter the graph size.
    * The only full-data passes are the one groupBy per histogram; the
    * k-expansion is a theta-join between two maxDegree-row tables
    * (broadcast, O(maxDeg²) driver-free work). */
  def richClub(g: Graph): DataFrame = {
    val spark = g.edges.sparkSession
    val deg = g.degrees
    val dc = deg.groupBy("degree").agg(count(lit(1)).as("nv"))
    val md = g.edges
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "du"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dv"), "dst")
      .select(least(col("du"), col("dv")).as("mdeg"))
      .groupBy("mdeg").agg(count(lit(1)).as("ne"))
    val maxDeg = deg.agg(max(col("degree")).cast("long")).head().getLong(0)
    val ks = spark.range(0, maxDeg).toDF("k")
    val nk = ks.join(dc, col("degree") > col("k"), "left")
      .groupBy("k").agg(coalesce(sum("nv"), lit(0L)).as("n_k"))
    val ek = ks.join(md, col("mdeg") > col("k"), "left")
      .groupBy("k").agg(coalesce(sum("ne"), lit(0L)).as("e_k"))
    nk.join(ek, "k")
      .filter(col("n_k") >= 2)
      .select(col("k"), col("n_k"), col("e_k"),
        round(lit(2.0) * col("e_k") /
          (col("n_k") * (col("n_k") - lit(1.0))), 6).as("rich_club"))
      .orderBy("k")
  }

  /** Degree assortativity: Pearson correlation of endpoint degrees over
    * the symmetrized edge stream. One broadcast-joinable degree table,
    * one corr aggregate. */
  def degreeAssortativity(g: Graph): DataFrame = {
    val deg = g.degrees
    g.symmetrized
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sdeg"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "ddeg"), "dst")
      .agg(round(corr(col("sdeg").cast("double"), col("ddeg").cast("double")), 4)
        .as("assortativity"))
  }

  /** Per-edge neighborhood Jaccard similarity (link-prediction feature):
    * |N(u)∩N(v)| / |N(u)∪N(v)| for every existing edge.
    *
    * Scale design: |N(u)∩N(v)| per edge IS the edge's triangle count, so
    * this reuses the oriented triangle stream — linear in the triangle
    * count; neither the sym ⋈ sym wedge join (quadratic in degree) nor
    * an adjacency-array ship (deg(u)+deg(v) longs per edge row). */
  def neighborJaccard(g: Graph): DataFrame = {
    val deg = g.degrees
    g.edges.select("src", "dst")
      .join(g.triangleEdgeCounts, Seq("src", "dst"), "left")
      .na.fill(0L, Seq("common"))
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "du"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dv"), "dst")
      .select(col("src"), col("dst"), col("common"),
        round(col("common") /
          (col("du") + col("dv") - col("common")), 6).as("jaccard"))
  }

  /** Weakest ties (nx.local_bridges generalized): the k edges with the
    * FEWEST common neighbors, flagged `is_bridge` when that count is 0
    * (a true local bridge — deleting it raises its endpoints' distance
    * above 2, Granovetter's "weak ties"). The top-k generalization
    * keeps the query meaningful on dense graphs where no strict local
    * bridge exists (sf0.001's co-purchase graph has none, which made
    * the strict form return an empty result there). An edge's
    * common-neighbor count IS its per-edge triangle count, so this is
    * a left join over the session-shared triangle-edge table — zero
    * new shuffles beyond the cached stream; the top-k is fully
    * tie-broken (common, src, dst). */
  def localBridges(g: Graph, k: Int = 20): DataFrame = {
    val deg = g.degrees
    g.edges.select("src", "dst")
      .join(g.triangleEdgeCounts, Seq("src", "dst"), "left")
      .na.fill(0L, Seq("common"))
      .join(deg.withColumnRenamed("id", "src")
        .withColumnRenamed("degree", "du"), "src")
      .join(deg.withColumnRenamed("id", "dst")
        .withColumnRenamed("degree", "dv"), "dst")
      .select(col("src"), col("dst"), col("common").as("common_cnt"),
        (col("common") === 0L).cast("int").as("is_bridge"),
        col("du"), col("dv"))
      .orderBy(col("common_cnt").asc, col("src").asc, col("dst").asc)
      .limit(k)
  }

  /** Vertices of the k-core: iterative peeling of vertices with degree
    * < k in the remaining subgraph. O(peel-rounds) join+agg iterations,
    * each linear in the surviving edge set. */
  def kCore(g: Graph, k: Int, maxIter: Int = 50): DataFrame = {
    var edges = g.edges.select("src", "dst").localCheckpoint(true)
    var changed = true
    var i = 0
    while (changed && i < maxIter) {
      val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val deg = sym.groupBy("src").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("src").as("id"))
      val pruned = edges
        .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst")
        .localCheckpoint(true)
      changed = pruned.count() != edges.count()
      edges = pruned
      i += 1
    }
    GraphBuilder.vertices(edges).withColumn("k", lit(k))
  }

  /** FULL core decomposition (nx.core_number) — every vertex's
    * coreness, not just k-core membership — via the iterated-h-index
    * fixpoint (Lü et al. 2016, "The H-index of a network node"):
    * start from degree; each round every vertex replaces its value
    * with the h-index of its neighbors' values; the fixpoint IS the
    * core number. Deterministic (the h-index is invariant to tie
    * order), so the oracle replays the unrolled rounds exactly.
    *
    * Scale shape: the symmetric edge list is persisted ONCE and stays
    * put; each round ships only the |V|-row state — broadcast below
    * 500k vertices, co-partitioned shuffle join beyond — then one
    * shuffle keyed on the receiving vertex for the rank window, whose
    * partitioning the following aggregate reuses. Convergence is
    * data-dependent (19 rounds at sf0.01, 38 at sf0.1). */
  def coreNumbers(g: Graph, maxIter: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = g.symmetrized.persist(StorageLevel.MEMORY_AND_DISK)
    val broadcastable = g.vertexCount <= Graph.broadcastVertexGate
    var state = g.degrees
      .select(col("id"), col("degree").cast("long").as("c"))
      .localCheckpoint(true)
    var changed = true
    var i = 0
    while (changed && i < maxIter) {
      val st = state.withColumnRenamed("id", "src")
      val msgs = sym
        .join(if (broadcastable) broadcast(st) else st, "src")
        .select(col("dst").as("v"), col("c").as("cv"))
      val w = Window.partitionBy("v").orderBy(col("cv").desc)
      val agg = msgs.withColumn("rn", row_number().over(w))
        .groupBy(col("v").as("id"))
        .agg(max(when(col("cv") >= col("rn"), col("rn"))
          .otherwise(lit(0L))).as("c"))
      val next = g.vertices.select("id").join(agg, Seq("id"), "left")
        .na.fill(0L, Seq("c"))
        .localCheckpoint(true)
      changed = next.join(state.withColumnRenamed("c", "pc"), "id")
        .filter(col("c") =!= col("pc")).count() > 0
      state = next
      i += 1
    }
    sym.unpersist(blocking = false)
    state.select(col("id"), col("c").as("core"))
  }

  /** Per-edge triangle support computed FRESH on an arbitrary canonical
    * (src < dst) edge set — the inner step of iterative peels that
    * re-evaluate support on a shrinking graph. Same degree-ordered
    * orientation + adjacency-intersection shape as
    * [[Graph.edgeCommonStats]] (never the Σ deg² wedge self-join), but
    * unpersisted and with plain shuffle joins: peel rounds run on
    * subsets whose size the peel itself controls, and at 100 TB the
    * adjacency side must be co-partitioned, not broadcast. */
  private def edgeSupport(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val e = edges
      .join(deg.select(col("id").as("src"), col("d").as("sd")), "src")
      .join(deg.select(col("id").as("dst"), col("d").as("dd")), "dst")
    val oriented = e.select(
      when(col("sd") < col("dd") ||
           (col("sd") === col("dd") && col("src") < col("dst")),
        struct(col("src").as("lo"), col("dst").as("hi")))
        .otherwise(struct(col("dst").as("lo"), col("src").as("hi"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    val adj = oriented.groupBy(col("lo").as("v"))
      .agg(sort_array(collect_list(col("hi"))).as("nbrs"))
    val tri = oriented
      .join(adj.select(col("v").as("lo"), col("nbrs").as("nu")), "lo")
      .join(adj.select(col("v").as("hi"), col("nbrs").as("nv")), Seq("hi"), "left")
      .select(col("lo"), col("hi"),
        explode(graft.functions.SortedLongIntersect.sortedIntersect(col("nu"),
          coalesce(col("nv"), typedLit(Array.empty[Long])))).as("w"))
    def leg(x: String, y: String): DataFrame =
      tri.select(least(col(x), col(y)).as("src"),
        greatest(col(x), col(y)).as("dst"))
    leg("lo", "hi").union(leg("lo", "w")).union(leg("hi", "w"))
      .groupBy("src", "dst").agg(count(lit(1)).as("support"))
  }

  /** k-truss (nx.k_truss): the maximal subgraph in which every edge
    * participates in at least k−2 triangles WITHIN the subgraph —
    * the edge analog of k-core and a much tighter cohesion filter
    * (it extracts the clique-ish core that co-purchase noise buries).
    * Peels to a fixpoint; requires k ≥ 3. Returns the surviving edges
    * with their final within-truss support.
    *
    * Round 1 reuses the session-cached [[Graph.edgeCommonStats]]
    * (support on the full graph — already materialized for the
    * link-prediction queries); every later round recomputes support
    * only on the survivors, which the peel itself shrinks. Each round
    * is localCheckpointed: iteration i's plan never re-derives rounds
    * 1..i−1. */
  def kTruss(g: Graph, k: Int, maxIter: Int = 50): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    var edges = g.edges.select("src", "dst").localCheckpoint(true)
    var sup = g.edgeCommonStats
      .select(col("src"), col("dst"), col("common").as("support"))
    var changed = true
    var i = 0
    while (changed && i < maxIter) {
      val keep = sup.filter(col("support") >= k - 2)
      val pruned = keep.select("src", "dst").localCheckpoint(true)
      changed = pruned.count() != edges.count()
      edges = pruned
      if (changed) sup = edgeSupport(edges).localCheckpoint(true)
      i += 1
    }
    sup.filter(col("support") >= k - 2)
      .select("src", "dst", "support")
  }

  /** Newman modularity of a vertex partition (labels: id, community):
    * Q = Σ_c [ e_c/m − (d_c/2m)² ]. Two aggregates over the labeled
    * edge/degree streams — no per-pair work. */
  def modularity(g: Graph, labels: DataFrame): DataFrame = {
    val m = g.edges.count().toDouble
    val lSrc = labels.select(col("id").as("src"), col("community").as("c1"))
    val lDst = labels.select(col("id").as("dst"), col("community").as("c2"))
    val intraByC = g.edges.join(lSrc, "src").join(lDst, "dst")
      .filter(col("c1") === col("c2"))
      .groupBy(col("c1").as("community")).agg(count(lit(1)).as("e_c"))
    val degByC = g.degrees.join(labels, "id")
      .groupBy("community").agg(sum("degree").as("d_c"))
    degByC.join(intraByC, Seq("community"), "left")
      .na.fill(0L, Seq("e_c"))
      .agg(round(sum(col("e_c") / m -
        pow(col("d_c") / (2.0 * m), 2)), 6).as("modularity"))
  }

  /** Connected-component size distribution. */
  def componentSizes(g: Graph): DataFrame =
    Gx.connectedComponents(g)
      .groupBy("component").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_components"))
}
