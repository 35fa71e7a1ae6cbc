package graft.graph

import org.apache.spark.graphx.{Edge, Graph => XGraph, VertexRDD}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HITS (hubs & authorities, Kleinberg) over a DIRECTED edge set —
  * meaningful only there: on an undirected graph hubs ≡ authorities ≡
  * eigenvector centrality, so this runs on the purchase-sequence graph
  * (the same directed derivation [[Scc]] uses).
  *
  * Fixed-iteration semantics, engine-portable like [[Gx.eigenvector]]:
  * per round, authᵢ = L2-normalize(Σ_in hubᵢ₋₁) then hubᵢ =
  * L2-normalize(Σ_out authᵢ) — the classic I-then-O sweep — with every
  * normalized vector rounded to 8 dp so the state is bit-identical
  * across engines and the unrolled DuckDB oracle replays it exactly.
  * (ref: the nx.hits metric family of /root/reference/main.py's
  * NetworkX layer.)
  *
  * Scale shape: state lives in [[VertexRDD]]s and every message graph
  * is derived ONE step from the cached base (never chained across
  * iterations — the replicated-vertex-view lineage growth that made
  * chained `outerJoinVertices` loops bimodally slow elsewhere).
  */
object Hits {

  /** (id, auth, hub) for every vertex of the directed edge DataFrame
    * [src, dst], values rounded to 6 dp. */
  def hits(edgesDf: DataFrame, iters: Int = 8): DataFrame = {
    val spark = edgesDf.sparkSession
    import spark.implicits._
    val ec = edgesDf.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    // edge-volume partitioning, same rule as Gx.of / Scc: the loop runs
    // 2 message rounds per iteration and each pays per-partition cost
    val parts = math.max(2L, ec.count() / 250000L + 1L).toInt
    val edgeRdd = ec.as[(Long, Long)].rdd.repartition(parts)
      .map { case (s, d) => Edge(s, d, 0) }
    val base: XGraph[Int, Int] =
      XGraph.fromEdges(edgeRdd, 0,
        StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK).cache()
    base.vertices.count()

    // micro-int state (value × 10⁶ as longs): message sums and norm
    // squares are exact integer arithmetic — no summation order can
    // shift a value across its rounding grid (same hardening as
    // Gx.eigenvector; the per-round round8(double) this replaces had a
    // residual ulp-at-the-boundary flake class)
    def normOf(v: VertexRDD[Long]): Double =
      math.sqrt(v.values.map(m => BigInt(m) * BigInt(m))
        .fold(BigInt(0))(_ + _).toDouble)
    var hub: VertexRDD[Long] = base.vertices.mapValues(_ => 1000000L).cache()
    var auth: VertexRDD[Long] = hub
    for (_ <- 1 to iters) {
      // I-step: authority mass flows along the edge direction
      val hg = base.outerJoinVertices(hub)((_, _, h) => h.getOrElse(1000000L)).cache()
      val authRaw = hg.aggregateMessages[Long](
        ctx => ctx.sendToDst(ctx.srcAttr), _ + _)
      // O(1) scalars to the driver: the L2 norms, never per-vertex data
      val an = normOf(authRaw)
      val prevAuth = auth
      auth = base.vertices.leftJoin(authRaw)((_, _, m) =>
        math.round(1e6 * m.getOrElse(0L).toDouble / an)).cache()
      // O-step: hub mass is the sum of the NEW authority of out-neighbors
      val ag = base.outerJoinVertices(auth)((_, _, a) => a.getOrElse(0L)).cache()
      val hubRaw = ag.aggregateMessages[Long](
        ctx => ctx.sendToSrc(ctx.dstAttr), _ + _)
      val hn = normOf(hubRaw)
      val prevHub = hub
      hub = base.vertices.leftJoin(hubRaw)((_, _, m) =>
        math.round(1e6 * m.getOrElse(0L).toDouble / hn)).cache()
      hub.count()
      prevAuth.unpersist(blocking = false)
      prevHub.unpersist(blocking = false)
      hg.unpersistVertices(blocking = false)
      ag.unpersistVertices(blocking = false)
    }
    auth.innerJoin(hub)((_, a, h) => (a, h))
      .map { case (id, (a, h)) => (id, a, h) }
      .toDF("id", "auth", "hub")
      .select(col("id"), round(col("auth") / 1e6, 6).as("auth"),
        round(col("hub") / 1e6, 6).as("hub"))
  }

  /** SALSA (Lempel–Moran, TOIS 2001) — the stochastic cousin of HITS:
    * authority scores are the stationary distribution of the
    * backward-then-forward random walk on the bipartite support graph
    * (hub copies on one side, authority copies on the other).
    *
    * NO power iteration: on each connected component of that bipartite
    * graph the chain's stationary distribution is in CLOSED FORM —
    * π(a) ∝ indeg(a) within the component — and the paper's meta-chain
    * weights each component by its share of authority-side nodes:
    *   auth(a) = (n_a(comp)/N_a) · indeg(a)/Σ_{comp} indeg,
    * hub symmetrically with outdeg. So where HITS pays 2·iters message
    * rounds, SALSA is ONE connected-components run (O(log n) rounds on
    * GraphX) plus two degree aggregations — at 100 TB this is the
    * entire plan, and the closed form is exact, not an estimate.
    *
    * Determinism: degrees, component ids (min vertex id) and node
    * counts are exact integers; each score is one double division of
    * exact-integer-valued doubles, rounded to 6 dp — engine-portable,
    * replayed by the unrolled min-label CC oracle.
    *
    * Vertex v's hub copy is 2v, its authority copy 2v+1 (a vertex may
    * hold both roles in different components — SALSA keeps the roles
    * independent by construction). Vertices with no in-edges score
    * auth 0; no out-edges, hub 0. */
  def salsa(edgesDf: DataFrame): DataFrame = {
    val spark = edgesDf.sparkSession
    val de = edgesDf.select("src", "dst")
    val be = de.select((col("src") * 2).as("src"),
      (col("dst") * 2 + 1).as("dst"))
    val bg = Graph(GraphBuilder.vertices(be), be)
    val cc = Gx.connectedComponents(bg) // (id, component = min member id)
    val ind = de.groupBy(col("dst").as("v")).agg(count(lit(1)).as("ind"))
    val outd = de.groupBy(col("src").as("v")).agg(count(lit(1)).as("outd"))
    val acc = cc.filter(col("id") % 2 === 1)
      .select(expr("(id - 1) div 2").as("v"), col("component"))
    val hcc = cc.filter(col("id") % 2 === 0)
      .select(expr("id div 2").as("v"), col("component"))
    // every authority copy has >= 1 in-edge by construction (it exists
    // because an edge points at it) — inner joins lose nothing
    val aj = acc.join(ind, "v")
    val hj = hcc.join(outd, "v")
    val aagg = aj.groupBy("component")
      .agg(sum("ind").as("sind"), count(lit(1)).as("na"))
    val hagg = hj.groupBy("component")
      .agg(sum("outd").as("soutd"), count(lit(1)).as("nh"))
    // bounded driver scalars (the two side totals), like landmark picks
    val ta = aj.count()
    val th = hj.count()
    // double PRODUCTS (not long products) on both engines: every factor
    // is an exact integer < 2^53, so the doubles are exact and the plan
    // never overflows at scale the way na·ind as int64 would
    val ascore = aj.join(aagg, "component").select(col("v").as("id"),
      round((col("na") * col("ind").cast("double")) /
        (lit(ta) * col("sind").cast("double")), 6).as("auth"))
    val hscore = hj.join(hagg, "component").select(col("v").as("id"),
      round((col("nh") * col("outd").cast("double")) /
        (lit(th) * col("soutd").cast("double")), 6).as("hub"))
    val dv = de.select(col("src").as("id"))
      .union(de.select(col("dst").as("id"))).distinct()
    dv.join(ascore, Seq("id"), "left")
      .join(hscore, Seq("id"), "left")
      .na.fill(0.0, Seq("auth", "hub"))
      .orderBy("id")
  }
}
