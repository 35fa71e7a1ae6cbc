package graft.tools

import graft.GraftSession

/** Dev probe: coloring cost, cold vs warm. */
object ProfileColor2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-color2", 32)
    def run(name: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    run("g_edges")
    run("g_coloring")
    run("g_coloring")
    spark.stop()
  }
}
