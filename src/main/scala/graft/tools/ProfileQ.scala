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
    // r11: job/stage counts per line — deterministic structure, robust
    // where wall-clock on the bimodal host is not
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
      })
    names.foreach { name =>
      val (j0, s0) = (jobs.get, stages.get)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"jobs=${jobs.get - j0} stages=${stages.get - s0}")
    }
    spark.stop()
  }
}
