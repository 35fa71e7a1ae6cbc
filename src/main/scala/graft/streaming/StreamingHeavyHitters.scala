package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming Misra–Gries heavy hitters: each micro-batch is sketched
  * DISTRIBUTED (the same mapPartitions + treeReduce kernel the batch
  * q_heavy_hitters uses), then folded into a bounded driver-held
  * summary via the associative mergeable-summaries merge — so the
  * whole-stream soundness bound est(x) ≤ exact(x) ≤ est(x) + dec
  * holds regardless of how the stream was micro-batched. Driver state
  * is O(counters), independent of stream length — the indefinitely-
  * running form of the heavy-hitters question.
  *
  * Used via `foreachBatch(hh.update _)`: foreachBatch is the
  * documented escape hatch for sinks that fold into external mutable
  * state; replays of a batch id re-merge the same counts, so pair it
  * with the idempotent-sink discipline (Sinks.scala) where exactly-
  * once matters.
  */
final class StreamingHeavyHitters(counters: Int) extends Serializable {
  @volatile private var summary: (Map[Long, Long], Long) = (Map.empty, 0L)

  /** Fold one micro-batch (single LONG column) into the summary. */
  def update(batch: DataFrame, batchId: Long): Unit = {
    import batch.sparkSession.implicits._
    val items = batch.as[Long].rdd
    if (!items.isEmpty()) {
      val b = graft.operators.Relational.mgSketch(items, counters)
      summary = graft.operators.Relational.mgMerge(summary, b, counters)
    }
  }

  /** (estimates, total decrement units): for every item,
    * est(x) ≤ exact(x) ≤ est(x) + dec. */
  def result: (Map[Long, Long], Long) = summary
}
