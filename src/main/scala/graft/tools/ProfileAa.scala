package graft.tools

import graft.GraftSession
import graft.graph.GraphBuilder

/** Dev probe: adamic-adar chain attribution. */
object ProfileAa {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-aa", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val g = t("coPurchase build") { GraphBuilder.coPurchase(spark, dir) }
    t("edges count") { g.edges.count() }
    t("degrees count") { g.degrees.count() }
    t("orientedCommon") { g.edgeCommonStats.count() }
    t("adamic adar") {
      graft.SparkEntry.queries("g_adamic_adar")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("adamic adar warm") {
      graft.SparkEntry.queries("g_adamic_adar")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
