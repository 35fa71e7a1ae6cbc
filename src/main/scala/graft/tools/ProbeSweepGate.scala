package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe: does the default-cap threshold sweep trigger the gated
  * (distributed CC) branch at this SF, and what do its stages cost?
  * Usage: runMain graft.tools.ProbeSweepGate <sfDir> [capPairs] */
object ProbeSweepGate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = args.lift(1).map(_.toInt).getOrElse(250000)
    val spark = GraftSession.get("probe-sweep-gate", 32)
    val docs = graft.Tables(spark, dir).documents
    var t0 = System.nanoTime()
    graft.operators.Dedup.cachedMinhashPairs(dir, docs, 0.8).count()
    println(f"[probe] pairs build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    val comp = graft.operators.Dedup
      .nearDupComponents(spark, docs, dir, 0.8)
    comp.count()
    println(f"[probe] components build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val memberCap = math.max(2L, math.sqrt(2.0 * cap).toLong)
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("nm"))
    val top = sizes.orderBy(col("nm").desc).limit(5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nBig = sizes.filter(col("nm") > memberCap).count()
    println(s"[probe] memberCap=$memberCap nBig=$nBig top5=$top")
    // actual pair count per oversized component (the member gate is a
    // C(m,2) over-approximation; how dense is the giant really?)
    val pairs = graft.operators.Dedup.cachedMinhashPairs(dir, docs, 0.8)
    val actual = pairs
      .join(comp.select(col("id").as("a"), col("component")), "a")
      .groupBy("component").agg(count(lit(1)).as("np"))
      .join(sizes.filter(col("nm") > memberCap), "component")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    println(s"[probe] big comp (component, pairs, members): ${actual.toSeq}")
    t0 = System.nanoTime()
    graft.operators.Dedup.dedupThresholdSweep(spark, dir, cap)
      .write.format("noop").mode("overwrite").save()
    println(f"[probe] sweep first: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    graft.operators.Dedup.dedupThresholdSweep(spark, dir, cap)
      .write.format("noop").mode("overwrite").save()
    println(f"[probe] sweep warm: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
