package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentHashMap

/** Dev probe (r12, VERDICT r11 #8): stage histogram of the gated
  * threshold-sweep build (sweep_gated_cc — 23.7 s at 8 cores vs 5.2 s
  * at 32 in BENCH_r11) at a chosen core count. Per stage: wall time,
  * task count, max/median task duration — a max/median ratio ≫ 5 in a
  * dominant stage means skew; max/median ≈ 1 with wall ≈ Σtask/cores
  * means the build is CPU-bound parallel work that 4× the cores
  * legitimately runs 4× faster.
  * Usage: runMain graft.tools.ProbeSweepCc8 [sfDir] [cpus] */
object ProbeSweepCc8 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = GraftSession.get("probe-sweep-cc", cpus)
    val taskMs = new ConcurrentHashMap[Int, java.util.ArrayList[Long]]()
    val stageWall = new ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val l = taskMs.computeIfAbsent(t.stageId,
          _ => new java.util.ArrayList[Long]())
        l.synchronized { l.add(t.taskInfo.duration) }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(0L)
        stageWall.put(si.stageId, (si.name.take(80), ms))
      }
    })
    // prerequisites the bench pays on other lines (pair cache, comps)
    val docs = graft.Tables(spark, dir).documents
    graft.operators.Dedup.cachedMinhashPairs(dir, docs, 0.8).count()
    graft.operators.Dedup.nearDupComponents(spark, docs, dir, 0.8).count()
    taskMs.clear(); stageWall.clear()
    val t0 = System.nanoTime()
    graft.operators.Dedup.dedupThresholdSweep(spark, dir).limit(1).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[sweepcc] sweep_gated_cc ${dt}%7.2f s at local[$cpus]")
    import scala.jdk.CollectionConverters._
    val rows = stageWall.asScala.toSeq.sortBy(-_._2._2).take(15)
    rows.foreach { case (sid, (name, wall)) =>
      val ds = Option(taskMs.get(sid)).map(_.asScala.toSeq.sorted)
        .getOrElse(Seq.empty)
      val med = if (ds.isEmpty) 0L else ds(ds.size / 2)
      val mx = if (ds.isEmpty) 0L else ds.last
      val sum = ds.sum
      println(f"[sweepcc]   stage $sid%4d wall=${wall}%6d ms tasks=${ds.size}%4d " +
        f"taskSum=${sum}%7d med=${med}%5d max=${mx}%6d  $name")
    }
    val totalTask = taskMs.asScala.values.map(_.asScala.sum).sum
    println(f"[sweepcc] total task-ms=${totalTask}%,d wall=${dt * 1000}%,.0f " +
      f"parallelism=${totalTask / (dt * 1000)}%.1f of $cpus cores")
    spark.stop()
  }
}
