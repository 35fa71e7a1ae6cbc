package graft.tools

import graft.GraftSession
import graft.graph.{Graph, GraphBuilder, Gx, Iterative}
import org.apache.spark.sql.functions._

/** r11 probe: SALSA's per-call bipartite CC — GraphX Pregel
  * (O(diameter) supersteps) vs the DataFrame large-star/small-star
  * (O(log n) rounds). Labels are spec-equal; which is cheaper on the
  * doubled graph? */
object ProbeSalsaCc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("probe-salsa-cc", 32)
    val de = graft.graph.Scc.lineSequenceEdges(spark, dir).select("src", "dst")
    val be = de.select((col("src") * 2).as("src"), (col("dst") * 2 + 1).as("dst"))
      .localCheckpoint(true)
    val bg = Graph(GraphBuilder.vertices(be), be)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    t("gx_cc_1") { Gx.connectedComponents(bg).count() }
    val bg2 = Graph(GraphBuilder.vertices(be), be) // fresh key, no memo
    t("gx_cc_2") { Gx.connectedComponents(bg2).count() }
    t("df_cc_1") { Iterative.connectedComponents(bg).count() }
    t("df_cc_2") { Iterative.connectedComponents(bg2).count() }
    // labels equal?
    val a = Gx.connectedComponents(bg)
    val b = Iterative.connectedComponents(bg)
    val diff = a.join(b.withColumnRenamed("component", "c2"), "id")
      .filter(col("component") =!= col("c2")).count()
    println(s"[prof] label_diff=$diff")
    spark.stop()
  }
}
