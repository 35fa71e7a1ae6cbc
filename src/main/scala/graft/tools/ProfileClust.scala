package graft.tools

import graft.GraftSession
import graft.graph._

/** Dev-only: attribute the clustering-family query costs at a given SF. */
object ProfileClust {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-clust", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    t("g_adamic_adar") { GraphQueries.adamicAdar(spark, dir).write.format("noop").mode("overwrite").save() }
    t("g_avg_clustering") { GraphQueries.avgClustering(spark, dir).write.format("noop").mode("overwrite").save() }
    t("g_clustering_coeff") { GraphQueries.clusteringCoeff(spark, dir).write.format("noop").mode("overwrite").save() }
    t("g_transitivity") { GraphQueries.transitivity(spark, dir).write.format("noop").mode("overwrite").save() }
    t("g_triangles") { GraphQueries.triangles(spark, dir).write.format("noop").mode("overwrite").save() }
    t("g_neighbor_jaccard") { GraphQueries.neighborJaccard(spark, dir).write.format("noop").mode("overwrite").save() }
    t("g_sample_metrics") { GraphQueries.sampleMetrics(spark, dir).write.format("noop").mode("overwrite").save() }
    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      println(s"[prof] cached: ${i.name} mem=${i.memSize / 1024 / 1024}MB parts=${i.numCachedPartitions}/${i.numPartitions}")
    }
    spark.stop()
  }
}
