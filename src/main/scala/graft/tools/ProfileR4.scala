package graft.tools

import graft.GraftSession
import graft.graph._

/** Round-4 micro-bench: triangle-family attribution + bfsPaths cost. */
object ProfileR4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-r4", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def run(name: String): Unit = t(name) {
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    run("g_assortativity")
    run("g_avg_clustering")
    run("g_avg_path_length")
    run("g_bfs_landmarks")
    run("g_bfs_paths")
    run("g_clustering_coeff")
    run("g_clustering_coeff") // second touch: should be cache-speed
  }
}
