package graft.tools

import graft.GraftSession
import graft.graph.{GraphBuilder, GraphQueries, Gx}

/** Dev profiling: time the round-2 hotspots in isolation at sf0.1. */
object ProfileR2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-r2", cpus = 32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val g = time("edge derivation + caches") {
      val g = GraphBuilder.coPurchase(spark, dir)
      g.degrees.count(); g
    }
    time("Gx.of build")(Gx.of(g))
    val lpa = time("Gx LPA 5 iters") {
      val l = Gx.labelPropagation(g, 5); l.count(); l
    }
    time("LPA labels recount")(lpa.count())
    time("normalizeLabels on it") {
      graft.graph.Iterative.normalizeLabels(lpa).count()
    }
    time("communities facade")(GraphBuilder.communities(spark, g).count())
    time("triangle cache")(GraphBuilder.triangles(g).count())
    time("triangleEnumeration count")(println("  tri3=" + g.triangleEnumeration.count()))
    time("community sample")(GraphQueries.communitySample(spark, dir).count())
    time("sample metrics")(GraphQueries.sampleMetrics(spark, dir).count())
    time("pagerank")(GraphQueries.pageRank(spark, dir).count())
    spark.stop()
  }
}
