package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Dev probe: time the current top bench lines in one JVM with the
  * Bench-attributed shared caches pre-warmed, two passes each. */
object ProbeTop8 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("probe-top8", 32)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    import graft.graph.{GraphBuilder, GraphQueries}
    import graft.operators.Dedup
    val g = GraphBuilder.coPurchase(spark, dir)
    val docs = Tables(spark, dir).documents
    t("warm:graph")(g.degrees.count())
    t("warm:lpa")(GraphBuilder.communities(spark, g).count())
    t("warm:louvain")(GraphQueries.louvainPhase1(spark, dir).count())
    t("warm:lsh_pairs")(Dedup.cachedMinhashPairs(dir, docs, 0.8).count())
    t("warm:lsh_components")(Dedup.nearDupComponents(spark, docs, dir, 0.8).count())
    t("warm:edge_common")(g.edgeCommonStats.count())
    t("warm:directed")(graft.graph.Scc.lineSequenceEdges(spark, dir).count())
    val names = Seq("g_percolation", "g_seed_comparison", "g_community_nmi",
      "g_influence_cascade", "g_edge_betweenness", "g_scc", "g_core_number",
      "g_salsa", "g_coloring", "d_threshold_sweep", "g_attack_robustness")
    for (pass <- 1 to 2; n <- names) {
      t(s"$n#$pass")(SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
  }
}
