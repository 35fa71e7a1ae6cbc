package graft.tools
import graft._
object ProbeBw {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-bw")
    val dir = "/root/testdata/sf0.01"
    val g = graph.GraphBuilder.coPurchase(spark, dir)
    println("EDGES=" + g.edges.count())
    val eb = graph.GxBetweenness.edgeRun(g, numSources = 8)
    println("EB_ROWS=" + eb.count())
    val vb = graph.GxBetweenness.run(g, numSources = 8)
    println("VB_ROWS=" + vb.count())
    spark.stop()
  }
}
