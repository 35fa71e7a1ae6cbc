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
    // md5-ordered uniform sample (not xxhash64): md5 reproduces in any
    // engine, which lets the whole estimator oracle-check in DuckDB
    val sources = g.vertices
      .orderBy(md5(concat_ws(":", col("id"), lit(seed))), col("id"))
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
    // δ is FIXED-POINT (long micro-units, 1e-9): each contribution
    // σv/σw·(1e9+δw) is rounded to a long before summing, so the sum is
    // exact integer arithmetic — independent of partial-agg order, hence
    // deterministic run-to-run AND engine-portable (the double inputs σ,
    // δw are themselves exact, so both engines compute the identical
    // contribution and round it identically)
    var next = levels.last.withColumn("delta", lit(0L))
    val deltas = ArrayBuffer(next)
    for (l <- levels.length - 2 to 0 by -1) {
      val cur = levels(l)
      val succ = next.select(col("s"), col("v").as("w"),
        col("sigma").as("sigma_w"), col("delta").as("delta_w"))
      val contrib = cur
        .join(sym.withColumnRenamed("src", "v").withColumnRenamed("dst", "w"), "v")
        .join(succ, Seq("s", "w"))
        .select(col("s"), col("v"),
          floor(col("sigma") / col("sigma_w")
            * (lit(1.0e9) + col("delta_w")) + lit(0.5)).cast("long").as("c"))
        .groupBy("s", "v").agg(sum("c").as("delta"))
      next = cur.join(contrib, Seq("s", "v"), "left")
        .na.fill(0L, Seq("delta"))
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
    // no final round(): micro-grid values land exactly on decimal .5
    // ties, where Spark (shortest-decimal HALF_UP) and other engines
    // (binary-double rounding) disagree — the exact rational
    // depMicro·n/(k·2·1e9) is bit-identical everywhere instead
    g.vertices.select("id").join(all, Seq("id"), "left")
      .na.fill(0L, Seq("dep"))
      .select(col("id"),
        ((col("dep") * lit(n)).cast("double") / lit(k * 2.0 * 1.0e9))
          .as("betweenness"))
  }
}
