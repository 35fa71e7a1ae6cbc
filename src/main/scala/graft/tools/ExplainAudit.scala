package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dumps formatted physical plans for the headline queries so scan
  * pruning (ReadSchema/PushedFilters), broadcast choices, and
  * WholeStageCodegen spans can be audited. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q3_top_revenue", "q5_region_revenue",
        "g_edges", "g_degree", "e_knn_brute", "d_exact_dedup")
    val spark = GraftSession.get("explain-audit", 8)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
