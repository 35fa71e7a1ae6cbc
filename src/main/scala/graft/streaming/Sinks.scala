package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Production sink patterns for Structured Streaming.
  *
  * Structured Streaming's delivery contract is AT-LEAST-ONCE into
  * arbitrary sinks: after a failure the engine replays the last
  * uncommitted micro-batch with the SAME batchId. End-to-end
  * exactly-once therefore needs the sink write to be IDEMPOTENT per
  * batchId — the foreachBatch + batchId-partitioned overwrite below is
  * the standard recipe (a replayed batch overwrites its own partition
  * instead of appending duplicates). Parquet partition dirs double as
  * the commit marker: a partition either fully exists or is
  * overwritten; readers see each batch's data at most once.
  */
object Sinks {

  /** Write one micro-batch idempotently: dynamic-overwrite the
    * `batch_id=<id>` partition of `path`. Exposed separately from
    * [[idempotentParquet]] so the replay property is directly
    * spec-testable (same batchId twice ⇒ same rows once). */
  def writeBatch(batch: DataFrame, path: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      batch
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
        .write
        .mode("overwrite")
        .partitionBy("batch_id")
        .parquet(path)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Attach the idempotent parquet sink to a stream:
    * `Sinks.idempotentParquet(df, path).start()`. */
  def idempotentParquet(stream: Dataset[Row], path: String): DataStreamWriter[Row] =
    stream.writeStream
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        writeBatch(batch.toDF(), path, batchId))

  /** Convenience: start the sink with a throwaway checkpoint under
    * `path` (tests / local runs; production passes its own). */
  def startIdempotentParquet(stream: Dataset[Row], path: String): StreamingQuery =
    idempotentParquet(stream, path)
      .option("checkpointLocation", s"$path/_checkpoint")
      .start()
}
