package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentHashMap

/** Dev probe (r12, VERDICT r11 #6): per-job and per-stage timing for
  * the louvain builds (and community_sample) at a chosen core count —
  * names the cause of the BENCH_r11 32-core spikes (30.1 s
  * louvain_phase1 vs 5.5 s same binary at 8 cores) with stage-level
  * evidence instead of folklore.
  * Usage: runMain graft.tools.ProfileLouvain [sfDir] [cpus] [build...] */
object ProfileLouvain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val only = args.drop(2).toSet
    val spark = GraftSession.get("profile-louvain", cpus)
    val jobStart = new ConcurrentHashMap[Int, (Long, String)]()
    val stageInfo = new ConcurrentHashMap[Int, (String, Long, Int)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, (System.nanoTime(),
          Option(j.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))).getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(j.jobId)).foreach { case (t0, d) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 50) lines.add(f"    job ${j.jobId}%4d ${ms}%8.0f ms  $d")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(0L)
        if (ms >= 100)
          lines.add(f"      stage ${si.stageId}%4d ${ms}%8d ms tasks=${si.numTasks}%4d  ${si.name.take(90)}")
      }
    })
    import graft.graph.{GraphBuilder, GraphQueries}
    def g = GraphBuilder.coPurchase(spark, dir)
    val builds: Seq[(String, () => Unit)] = Seq(
      "warmup" -> (() => { g.degrees.count(); () }),
      "community_sample" -> (() =>
        { graft.graph.CommunitySample.sample(spark, g).count(); () }),
      "louvain_phase1" -> (() =>
        { GraphQueries.louvainPhase1(spark, dir).count(); () }),
      "louvain_two_level" -> (() =>
        { GraphQueries.louvain2(spark, dir).count(); () })
    )
    builds.filter(b => only.isEmpty || only(b._1) || b._1 == "warmup")
      .foreach { case (name, f) =>
        lines.clear()
        val t0 = System.nanoTime()
        f()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[lprof] $name%-18s ${dt}%7.2f s (cpus=$cpus) — jobs/stages >=50/100 ms:")
        lines.forEach(l => println("[lprof]" + l))
      }
    spark.stop()
  }
}
