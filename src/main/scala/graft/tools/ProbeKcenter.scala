package graft.tools

/** One-off smoke timing for the incremental k-center loop at larger k
  * (r11: the O(k·n·d) running-min rewrite must stay flat per pick —
  * the old expression-chain form grew per-pick cost linearly).
  * Usage: runMain graft.tools.ProbeKcenter [sfDir] [k]. */
object ProbeKcenter {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = graft.GraftSession.get("graft-probe-kcenter", 8)
    val t0 = System.nanoTime()
    val n = graft.operators.Ann.kcenterCoreset(spark, sfDir, k).count()
    println(f"[probe] kcenter k=$k rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
