package graft.tools

import graft.GraftSession
import graft.graph.GraphBuilder
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: triangle-stream stage attribution. */
object ProfileTri2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-tri2", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val g = GraphBuilder.coPurchase(spark, dir)
    t("edges") { g.edges.count() }
    t("degrees") { g.degrees.count() }
    val deg = broadcast(g.degrees)
    val e = g.edges.select("src", "dst")
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sdeg"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "ddeg"), "dst")
    val oriented = t("orient+persist") {
      val o = e.select(
        when(col("sdeg") < col("ddeg") ||
             (col("sdeg") === col("ddeg") && col("src") < col("dst")),
          struct(col("src").as("lo"), col("dst").as("hi")))
          .otherwise(struct(col("dst").as("lo"), col("src").as("hi")))
          .as("e"))
        .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      o.count(); o
    }
    val adj = t("adjacency") {
      val a = oriented.groupBy(col("lo").as("v"))
        .agg(collect_list(col("hi")).as("nbrs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      a.count(); a
    }
    t("join+intersect+persist") {
      val r = oriented
        .join(broadcast(adj).select(col("v").as("lo"), col("nbrs").as("nu")), "lo")
        .join(broadcast(adj).select(col("v").as("hi"), col("nbrs").as("nv")), Seq("hi"), "left")
        .select(col("lo"), col("hi"),
          array_intersect(col("nu"),
            coalesce(col("nv"), typedLit(Array.empty[Long]))).as("common"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      r.count()
    }
    spark.stop()
  }
}
