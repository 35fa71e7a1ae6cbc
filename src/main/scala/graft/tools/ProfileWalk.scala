package graft.tools

import graft.GraftSession

/** Dev probe: node2vec walk cost attribution (joins vs pick lambdas). */
object ProfileWalk {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-walk", 32)
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
    run("g_walk_corpus")
    run("g_node2vec_corpus")
    run("g_node2vec_corpus")
    spark.stop()
  }
}
