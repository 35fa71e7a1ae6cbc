package graft

import graft.operators.Distributed
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase global rank / prefix sum / ntile must agree exactly
  * with the single-partition window definitions they replace, while
  * keeping every partition working (no SinglePartition exchange under
  * the Window). */
class DistributedSpec extends AnyFunSuite {
  import SparkTestSession._

  private def base = {
    import spark.implicits._
    // values with ties, negative and skewed weights, >1 partition
    (1 to 500).map(i => (i.toLong, (i * 7919 % 97).toLong, (i % 13).toLong))
      .toDF("id", "v", "w")
      .repartition(8)
  }

  test("rankedPrefix matches the global-window rank and running sum") {
    val df = base
    val got = Distributed.rankedPrefix(df,
      Seq(col("v").asc, col("id").asc), col("w"), numParts = 8)
      .select("id", "g_rank", "g_cum")
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val want = df.select(col("id"),
      row_number().over(w).cast("long").as("g_rank"),
      sum("w").over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("g_cum"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("rankedPrefix handles a descending sort key") {
    val df = base
    val got = Distributed.rankedPrefix(df,
      Seq(col("v").desc, col("id").asc), col("w"), numParts = 4)
      .select("id", "g_rank", "g_cum")
    val w = Window.orderBy(col("v").desc, col("id").asc)
    val want = df.select(col("id"),
      row_number().over(w).cast("long").as("g_rank"),
      sum("w").over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("g_cum"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("distributed ntile matches SQL ntile for n not dividing N") {
    val df = base // 500 rows, 7 buckets: first 3 get 72, rest 71
    val got = Distributed.ntile(df, Seq(col("v").asc, col("id").asc), 7,
      "bucket", numParts = 8).select("id", "bucket")
    val want = df.select(col("id"),
      ntile(7).over(Window.orderBy(col("v").asc, col("id").asc))
        .cast("long").as("bucket"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("distributed ntile: N < n degenerates to one row per bucket") {
    import spark.implicits._
    val tiny = Seq((1L, 10L), (2L, 5L), (3L, 7L)).toDF("id", "v")
    val got = Distributed.ntile(tiny, Seq(col("v").asc, col("id").asc), 5,
      "bucket", numParts = 2)
      .select("id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got == Map(2L -> 1L, 3L -> 2L, 1L -> 3L))
  }

  test("rankedPrefix plan: no window, no single-partition exchange") {
    // the global rank is a range exchange + per-partition scan +
    // broadcast offsets — nothing in the plan may funnel the table
    // through one task
    val plan = Distributed.rankedPrefix(base,
      Seq(col("v").asc, col("id").asc), col("w"), numParts = 8)
      .queryExecution.sparkPlan.treeString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
