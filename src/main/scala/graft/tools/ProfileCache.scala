package graft.tools

import graft.GraftSession
import graft.graph._

/** Dev-only: is the memoized triangle table actually served from cache?
  * Times repeated counts and prints real storage-level fractions. */
object ProfileCache {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-cache", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val g = GraphBuilder.coPurchase(spark, dir)
    t("edges") { g.edges.count() }
    val tri = GraphBuilder.triangles(g)
    t("tri-first") { tri.count() }
    t("tri-second") { tri.count() }
    t("tri-third") { tri.count() }
    t("tri-agg") { tri.groupBy().sum("triangles").collect() }
    val ecs = g.edgeCommonStats
    t("ecs-first") { ecs.count() }
    t("ecs-second") { ecs.count() }
    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      println(s"[prof] cached '${i.name.linesIterator.next()}' " +
        s"mem=${i.memSize / 1024 / 1024}MB disk=${i.diskSize / 1024 / 1024}MB " +
        s"parts=${i.numCachedPartitions}/${i.numPartitions}")
    }
    spark.stop()
  }
}
