package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the 100 TB mechanic for repeated co-located
  * joins: writing both fact tables bucketed by the join key means every
  * subsequent join on that key is exchange-free (bucket pruning does the
  * partitioning work once, at write time, instead of shuffling per
  * query).
  *
  * On a cluster this writes to the warehouse; locally the in-memory
  * catalog + `spark.sql.warehouse.dir` serve the same plans, which is
  * what `BucketingSpec` asserts on (no ShuffleExchange in the joined
  * plan).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner emits a
    * SortMergeJoin with NO exchange on either side when bucket counts
    * match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
