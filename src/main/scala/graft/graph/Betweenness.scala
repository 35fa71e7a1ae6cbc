package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Distributed Brandes betweenness centrality from sampled sources
  * (ref: nx.betweenness_centrality, /root/reference/main.py:147-149 —
  * computed there on a driver-collected NetworkX graph).
  *
  * Brandes' algorithm per source s: forward BFS accumulating σ (number
  * of shortest s-paths per vertex), then a backward sweep accumulating
  * dependencies δ(v) = Σ_w σ(v)/σ(w) · (1+δ(w)) over successors w.
  * Here both sweeps run for ALL sources simultaneously, keyed by source
  * column, level-synchronously: 2·diameter join+agg rounds total, not
  * 2·diameter·k. Exact when sources = all vertices; with k sampled
  * sources the result is the standard Brandes–Pich estimator scaled by
  * n/k.
  */
object Betweenness {

  /** @return (id, betweenness) — unnormalized undirected betweenness
    *         (each unordered pair counted once), scaled by n/k when
    *         sources are a sample.
    *
    * Sources are a SEEDED UNIFORM vertex sample (hash-ordered), not
    * high-degree landmarks: the n/k Brandes–Pich extrapolation is only
    * unbiased for uniform sources — degree-biased landmarks would
    * systematically overweight paths through hubs. */
  def run(g: Graph, numSources: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = g.edges.sparkSession
    val sym = g.symmetrized.localCheckpoint(true)
    val n = g.vertices.count()
    val sources = g.vertices
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(numSources).select("id")
    val k = math.min(numSources.toLong, n)

    // ---- forward sweep: per-level (s, v, sigma) ----
    val levels = ArrayBuffer.empty[DataFrame]
    var state = sources.select(col("id").as("s"), col("id").as("v"),
      lit(1.0).as("sigma")).localCheckpoint(true)
    levels += state
    var frontier = state
    while (!frontier.isEmpty) {
      val next = frontier
        .join(sym.withColumnRenamed("src", "v"), "v")
        .select(col("s"), col("dst").as("v"), col("sigma"))
        .join(state.select("s", "v"), Seq("s", "v"), "left_anti")
        .groupBy("s", "v").agg(sum("sigma").as("sigma"))
        .localCheckpoint(true)
      if (!next.isEmpty) levels += next
      // union of checkpointed levels: shallow lineage, skip re-materialize
      state = state.union(next)
      frontier = next
    }

    // ---- backward sweep: deepest level has δ = 0 ----
    var next = levels.last.withColumn("delta", lit(0.0))
    val deltas = ArrayBuffer(next)
    for (l <- levels.length - 2 to 0 by -1) {
      val cur = levels(l)
      val succ = next.select(col("s"), col("v").as("w"),
        col("sigma").as("sigma_w"), col("delta").as("delta_w"))
      val contrib = cur
        .join(sym.withColumnRenamed("src", "v").withColumnRenamed("dst", "w"), "v")
        .join(succ, Seq("s", "w"))
        .select(col("s"), col("v"),
          (col("sigma") / col("sigma_w") * (lit(1.0) + col("delta_w"))).as("c"))
        .groupBy("s", "v").agg(sum("c").as("delta"))
      next = cur.join(contrib, Seq("s", "v"), "left")
        .na.fill(0.0, Seq("delta"))
        .localCheckpoint(true)
      deltas += next
    }

    // δ of a vertex at its own source level excludes the source itself
    val all = deltas.reduce(_ union _)
      .filter(col("s") =!= col("v"))
      .groupBy(col("v").as("id"))
      .agg(sum("delta").as("dep"))
    // undirected: each pair counted twice across full source sets → /2;
    // sampled sources → extrapolate by n/k
    g.vertices.select("id").join(all, Seq("id"), "left")
      .na.fill(0.0, Seq("dep"))
      .select(col("id"),
        round(col("dep") * (n.toDouble / k) / 2.0, 6).as("betweenness"))
  }
}
