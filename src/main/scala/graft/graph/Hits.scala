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

    var hub: VertexRDD[Double] = base.vertices.mapValues(_ => 1.0).cache()
    var auth: VertexRDD[Double] = hub
    for (_ <- 1 to iters) {
      // I-step: authority mass flows along the edge direction
      val hg = base.outerJoinVertices(hub)((_, _, h) => h.getOrElse(1.0)).cache()
      val authRaw = hg.aggregateMessages[Double](
        ctx => ctx.sendToDst(ctx.srcAttr), _ + _)
      // O(1) scalars to the driver: the L2 norms, never per-vertex data
      val an = math.sqrt(authRaw.values.map(v => v * v).sum())
      val prevAuth = auth
      auth = base.vertices.leftJoin(authRaw)((_, _, m) =>
        Gx.round8(m.getOrElse(0.0) / an)).cache()
      // O-step: hub mass is the sum of the NEW authority of out-neighbors
      val ag = base.outerJoinVertices(auth)((_, _, a) => a.getOrElse(0.0)).cache()
      val hubRaw = ag.aggregateMessages[Double](
        ctx => ctx.sendToSrc(ctx.dstAttr), _ + _)
      val hn = math.sqrt(hubRaw.values.map(v => v * v).sum())
      val prevHub = hub
      hub = base.vertices.leftJoin(hubRaw)((_, _, m) =>
        Gx.round8(m.getOrElse(0.0) / hn)).cache()
      hub.count()
      prevAuth.unpersist(blocking = false)
      prevHub.unpersist(blocking = false)
      hg.unpersistVertices(blocking = false)
      ag.unpersistVertices(blocking = false)
    }
    auth.innerJoin(hub)((_, a, h) => (a, h))
      .map { case (id, (a, h)) => (id, a, h) }
      .toDF("id", "auth", "hub")
      .select(col("id"), round(col("auth"), 6).as("auth"),
        round(col("hub"), 6).as("hub"))
  }
}
