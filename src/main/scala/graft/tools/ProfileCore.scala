package graft.tools

import graft.GraftSession
import graft.graph._

/** Dev-only: cost of the core-decomposition implementations at a SF. */
object ProfileCore {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-core", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val g = GraphBuilder.coPurchase(spark, dir)
    t("edges") { g.edges.count() }
    t("gx-build") { Gx.of(g).vertices.count() }
    t("core-gx") {
      Gx.coreNumbers(g).write.format("noop").mode("overwrite").save()
    }
    t("core-gx-2nd") {
      Gx.coreNumbers(g).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
