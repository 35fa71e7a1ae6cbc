package graft.tools

import graft.GraftSession
import graft.graph.{GraphBuilder, Iterative}

/** Dev probe: rounds-to-fixpoint of Jones-Plassmann coloring. */
object ProfileColor {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("profile-color", 8)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val g = GraphBuilder.coPurchase(spark, sf)
      val n = g.vertices.count()
      var lo = 0
      for (r <- Seq(2, 4, 6, 8, 12, 16)) {
        if (lo == 0) {
          val colored = Iterative.greedyColoring(g, rounds = r).count()
          println(s"[color] $sf rounds=$r colored=$colored/$n")
          if (colored == n) lo = r
        }
      }
    }
    spark.stop()
  }
}
