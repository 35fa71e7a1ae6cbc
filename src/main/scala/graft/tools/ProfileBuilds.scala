package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Dev probe (r11): time every Bench shared-build in bench order inside
  * ONE session, and count jobs/stages/tasks per build via a listener —
  * job/stage counts are deterministic, so they survive the bimodal
  * host where wall-clock alone does not.
  * Usage: runMain graft.tools.ProfileBuilds [sfDir] [name ...] */
object ProfileBuilds {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSet
    val spark = GraftSession.get("profile-builds", 32)
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    import graft.graph.{GraphBuilder, GraphQueries}
    import graft.operators.Dedup
    def g = GraphBuilder.coPurchase(spark, dir)
    def docs = Tables(spark, dir).documents
    val builds: Seq[(String, () => Unit)] = Seq(
      "co_purchase_graph" -> (() => { g.degrees.count(); () }),
      "directed_edges" -> (() => { graft.graph.Scc.lineSequenceEdges(spark, dir).count(); () }),
      "scc_labels" -> (() => { graft.graph.Scc.labels(spark, dir).count(); () }),
      "edge_common_stats" -> (() => { g.edgeCommonStats.count(); () }),
      "square_count_kernel" -> (() => { g.squareCount.count(); () }),
      "clique4_kernel" -> (() => { g.clique4Count.count(); () }),
      "brandes_sweep" -> (() => { graft.graph.GxBetweenness.run(g, 8).count(); () }),
      "lpa_communities" -> (() => { GraphBuilder.communities(spark, g).count(); () }),
      "community_sample" -> (() => { graft.graph.CommunitySample.sample(spark, g).count(); () }),
      "louvain_phase1" -> (() => { GraphQueries.louvainPhase1(spark, dir).count(); () }),
      "louvain_two_level" -> (() => { GraphQueries.louvain2(spark, dir).count(); () }),
      "lsh_pairs" -> (() => { Dedup.cachedMinhashPairs(dir, docs, 0.8).count(); () }),
      "lsh_components" -> (() => { Dedup.nearDupComponents(spark, docs, dir, 0.8).count(); () }),
      "band_index" -> (() => { Dedup.incrementalDedup(spark, dir).limit(1).count(); () }),
      "sweep_gated_cc" -> (() => { Dedup.dedupThresholdSweep(spark, dir).limit(1).count(); () }),
      "pq_index" -> (() => { graft.operators.Ann.knnPq(spark, dir).count(); () }),
      "ivfpq_index" -> (() => { graft.operators.Ann.knnIvfPq(spark, dir).count(); () }),
      "sq_table" -> (() => { graft.operators.Ann.sqDecoded(spark, dir).count(); () }),
      "bq_codes" -> (() => { graft.operators.Ann.bqCodes(spark, dir).count(); () }),
      "opq_index" -> (() => { graft.operators.Ann.knnOpq(spark, dir).count(); () }),
      "vector_index" -> (() =>
        { graft.operators.AnnIndex.incrementalSemDedup(spark, dir).limit(1).count(); () })
    )
    builds.filter(b => only.isEmpty || only(b._1)).foreach { case (name, f) =>
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime()
      f()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $name%-22s ${dt}%7.2f s  jobs=${jobs.get - j0}%4d stages=${stages.get - s0}%5d tasks=${tasks.get - k0}%6d")
    }
    spark.stop()
  }
}
