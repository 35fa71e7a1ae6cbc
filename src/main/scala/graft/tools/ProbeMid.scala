package graft.tools

import graft.{GraftSession, SparkEntry}

object ProbeMid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("probe-mid", 32)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // pre-warm the bench-attributed builds that feed these lines
    t("warm:louvain2")(graft.graph.GraphQueries.louvain2(spark, dir).count())
    t("warm:ecs")(graft.graph.GraphBuilder.coPurchase(spark, dir).edgeCommonStats.count())
    val names = Seq("g_clique4", "g_square_count", "g_graphlet_census",
      "g_community_nmi", "g_link_temporal_eval", "q_countmin", "q_rfm",
      "g_mst", "g_weighted_clustering")
    for (n <- names)
      t(n)(SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save())
  }
}
