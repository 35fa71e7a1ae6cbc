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
}
