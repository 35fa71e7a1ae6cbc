package graft.tools

import graft.GraftSession
import graft.graph._

object ProfileTri {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-tri", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    val g = GraphBuilder.coPurchase(spark, dir)
    t("edges-materialize") { g.edges.count() }
    val deg = t("degrees") {
      val d = g.degrees.persist(StorageLevel.MEMORY_AND_DISK); d.count(); d
    }
    val oriented = t("orient") {
      val e = g.edges.select("src", "dst")
        .join(broadcast(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sdeg")), "src")
        .join(broadcast(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "ddeg")), "dst")
        .select(
          when(col("sdeg") < col("ddeg") ||
            (col("sdeg") === col("ddeg") && col("src") < col("dst")),
            struct(col("src").as("lo"), col("dst").as("hi")))
            .otherwise(struct(col("dst").as("lo"), col("src").as("hi"))).as("e"))
        .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    val adjHi = t("adjacency") {
      val a = oriented.groupBy(col("lo").as("v"))
        .agg(collect_list(col("hi")).as("nbrs")).persist(StorageLevel.MEMORY_AND_DISK)
      a.count(); a
    }
    t("intersect-join") {
      oriented
        .join(broadcast(adjHi.select(col("v").as("lo"), col("nbrs").as("nu"))), "lo")
        .join(broadcast(adjHi.select(col("v").as("hi"), col("nbrs").as("nv"))), Seq("hi"), "left")
        .select(col("lo"), col("hi"),
          array_intersect(col("nu"),
            coalesce(col("nv"), typedLit(Array.empty[Long]))).as("common"))
        .select(sum(size(col("common")))).collect()
    }
    t("triangles-cache") { GraphBuilder.triangles(g).count() }
    t("avg-clustering") {
      g.averageClustering(GraphBuilder.triangles(g)).collect()
    }
    t("edge-tri-counts") { g.triangleEdgeCounts.count() }
    t("edge-tri-counts-2nd") { g.triangleEdgeCounts.count() }
    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      println(s"[prof] cached: ${i.name} mem=${i.memSize / 1024 / 1024}MB " +
        s"parts=${i.numCachedPartitions}/${i.numPartitions}")
    }
    spark.stop()
  }
}
