package graft.tools

import org.apache.spark.sql.functions._

/** r11 diagnosis: fb_triangle_estimate_nobroadcast read ~5.3 s with
  * the probe-graph edges recomputed per probe, ~12 s reading them from
  * a MEMORY_AND_DISK cache. This probe times the estimator on the
  * SAME synthetic 600k graph in both modes, twice each, to separate
  * cache-read cost from plan-shape changes. */
object ProbeFbTriangle {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("graft-probe-fbtri", 32)
    import graft.graph.{Graph, GraphQueries}
    val n = 600000L
    def rawEdges = {
      val ring = spark.range(n)
        .selectExpr("id AS src", s"(id + 1) % $n AS dst")
      val chords1 = spark.range(n)
        .selectExpr("id AS src", s"(id * 2654435761) % $n AS dst")
      val chords2 = spark.range(n)
        .selectExpr("id AS src", s"(id * 40503 + 12345) % $n AS dst")
      ring.union(chords1).union(chords2)
        .selectExpr("least(src, dst) AS src", "greatest(src, dst) AS dst")
        .filter("src <> dst").distinct()
    }
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // uncached: the r9/r10 shape (build recomputed inside the probe)
    val gU = Graph(spark.range(n).toDF("id"), rawEdges)
    require(gU.vertexCount > Graph.broadcastVertexGate)
    time("uncached-1") { GraphQueries.triangleEstimateOn(gU, 4, 42L).head() }
    time("uncached-2") { GraphQueries.triangleEstimateOn(gU, 4, 42L).head() }
    // cached: the r11 bench shape
    val cached = rawEdges
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cache-build") { cached.count() }
    val gC = Graph(spark.range(n).toDF("id"), cached)
    time("cached-1") { GraphQueries.triangleEstimateOn(gC, 4, 42L).head() }
    time("cached-2") { GraphQueries.triangleEstimateOn(gC, 4, 42L).head() }
    // flattened leaf (Materialize.table): cache + LogicalRDD leaf
    cached.unpersist(blocking = false)
    val flat = graft.Materialize.table(rawEdges)
    val gF = Graph(spark.range(n).toDF("id"), flat)
    time("flat-1") { GraphQueries.triangleEstimateOn(gF, 4, 42L).head() }
    time("flat-2") { GraphQueries.triangleEstimateOn(gF, 4, 42L).head() }
    spark.stop()
  }
}
