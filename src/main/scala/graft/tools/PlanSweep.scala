package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, SortMergeJoinExec}

/** r11 breadth audit: construct EVERY SparkEntry query, count the
  * structural smells in its physical plan (shuffle exchanges,
  * sort-merge joins, cartesian products) and the driver-side
  * construction+planning time. InMemoryRelation children are NOT
  * descended into (a memoized build's internal shuffles are paid once,
  * not per consumer).
  * Usage: runMain graft.tools.PlanSweep [sfDir] */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("plan-sweep", 32)
    def topLevel(p: SparkPlan): Seq[SparkPlan] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
      def walk(n: SparkPlan): Unit = {
        buf += n
        n match {
          case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          case _ => n.children.foreach(walk)
        }
      }
      walk(p); buf.toSeq
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val plan = df.queryExecution.sparkPlan
        val dt = (System.nanoTime() - t0) / 1e9
        val nodes = topLevel(plan)
        val ex = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
        val smj = nodes.count(_.isInstanceOf[SortMergeJoinExec])
        val cart = nodes.count(_.isInstanceOf[CartesianProductExec])
        val bhj = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
        println(f"[sweep] $name%-28s plan_s=$dt%6.2f ex=$ex%3d smj=$smj%2d cart=$cart%2d bhj=$bhj%2d nodes=${nodes.size}%4d")
      } catch { case e: Throwable =>
        println(s"[sweep] $name ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    spark.stop()
  }
}
