package graft.tools

import graft.GraftSession
import graft.graph._
import org.apache.spark.sql.functions._

object ProfileCc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-cc", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val g = GraphBuilder.coPurchase(spark, dir)
    g.edges.count()
    val comms = GraphBuilder.communities(spark, g)
    comms.count()
    val cSrc = comms.select(col("id").as("src"), col("community").as("c1"))
    val cDst = comms.select(col("id").as("dst"), col("community").as("c2"))
    val intra = g.edges.join(cSrc, "src").join(cDst, "dst")
      .filter(col("c1") === col("c2"))
      .select(col("src"), col("dst"), col("c1").as("community"))
      .localCheckpoint(true)
    println("[prof] intra: " + intra.count())
    val sub = Graph(comms.select("id"), intra.select("src", "dst"))
    t("cc-count") { sub.clusteringCoefficients.count() }
    t("cc-collect") { sub.clusteringCoefficients.select("id", "clustering_coeff").collect().length }
    t("cc-checkpoint") { sub.clusteringCoefficients.select("id", "clustering_coeff").localCheckpoint(true).count() }
    val deg = sub.degrees
    t("deg-only-collect") { deg.collect().length }
    val tri = sub.triangleVertexCounts
    t("tri-only-collect") { tri.collect().length }
    spark.stop()
  }
}
