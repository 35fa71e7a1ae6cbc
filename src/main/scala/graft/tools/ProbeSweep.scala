package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Dev probe: where does d_threshold_sweep's bench time go? */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("probe-sweep", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = Tables(spark, dir).documents
    t("pairs cache build")(Dedup.cachedMinhashPairs(dir, docs, 0.8).count())
    t("sweep full (warm pairs)") {
      Dedup.dedupThresholdSweep(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("sweep again") {
      Dedup.dedupThresholdSweep(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
  }
}
