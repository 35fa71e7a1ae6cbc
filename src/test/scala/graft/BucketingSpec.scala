package graft

import graft.sources.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def cleanup(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
  }

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val t = Tables(spark, sf)
    cleanup("li_b", "ord_b")
    // static planning: with AQE on, executedPlan is an opaque
    // AdaptiveSparkPlanExec wrapper until executed and the exchange
    // assertions would inspect nothing
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    Bucketing.writeBucketed(
      t.lineitem.select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "k"), "li_b", "k", buckets = 8)
    Bucketing.writeBucketed(
      t.orders.select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "k"), "ord_b", "k", buckets = 8)

    val joined = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "k")
    val plan = joined.queryExecution.executedPlan
    val shuffles = plan.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty,
      s"bucketed join should be exchange-free, got:\n${plan.treeString}")
    assert(joined.count() > 0)

    // contrast: the same join on unbucketed data shuffles both sides
    // (broadcast disabled so the tiny test tables don't sidestep it)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val unbucketed = t.lineitem.select("l_orderkey", "l_quantity")
        .join(t.orders.select("o_orderkey", "o_totalprice"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      unbucketed.count()
      val unbucketedShuffles = unbucketed.queryExecution.executedPlan
        .collect { case s: ShuffleExchangeLike => s }
      assert(unbucketedShuffles.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
