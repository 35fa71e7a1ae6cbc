package graft.tools

import graft.GraftSession
import graft.graph._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object ProfilePr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-pr", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val g = GraphBuilder.coPurchase(spark, dir)
    g.edges.count()

    def pr(interval: Int): DataFrame = {
      val sym = g.symmetrized.localCheckpoint(true)
      val deg = sym.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg")).localCheckpoint(true)
      var ranks = deg.select(col("id"), lit(1.0).as("rank"))
      for (i <- 1 to 10) {
        val contribs = sym
          .join(ranks.withColumnRenamed("id", "src"), "src")
          .join(deg.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
          .groupBy("id").agg(sum("c").as("in_rank"))
        ranks = deg.select("id")
          .join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(0.15) + lit(0.85) * coalesce(col("in_rank"), lit(0.0))).as("rank"))
        if (i % interval == 0 || i == 10) ranks = ranks.localCheckpoint(true)
      }
      ranks
    }
    t("pagerank-ckpt-every-1") { pr(1).count() }
    t("pagerank-ckpt-every-3") { pr(3).count() }
    t("pagerank-ckpt-every-1b") { pr(1).count() }
    t("pagerank-ckpt-every-3b") { pr(3).count() }
    spark.stop()
  }
}
