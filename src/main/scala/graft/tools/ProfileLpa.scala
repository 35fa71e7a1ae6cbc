package graft.tools

import graft.GraftSession
import graft.graph._

/** Where does g_community_count's first-touch time go?
  * Breaks the communities() materialization into: graph build, GraphX
  * LPA supersteps, label normalization, persist+count. */
object ProfileLpa {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-lpa", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val g = GraphBuilder.coPurchase(spark, dir)
    t("edges count") { g.edges.count() }
    t("Gx.of build") { Gx.of(g).vertices.count() }
    val labels = t("LPA 5 iters") {
      val l = Gx.labelPropagation(g, 5)
      l.count()
      l
    }
    t("normalizeLabels") {
      Iterative.normalizeLabels(labels).count()
    }
    t("communities() cached end-to-end") {
      GraphBuilder.communities(spark, g).count()
    }
  }
}
