package graft.tools

import graft.GraftSession

/** Dev probe: time arbitrary SparkEntry queries by name.
  * Usage: runMain graft.tools.ProfileQ <sfDir> <query> [query ...]
  * (repeat a name to measure warm cost). */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = GraftSession.get("profile-q", 32)
    names.foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
