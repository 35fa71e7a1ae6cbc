package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization helper for the session-lived memoized tables
  * (adjacency, triangle stream, LPA labels, samples, LSH pairs …).
  *
  * `table(df)` = persist → count → [[org.apache.spark.sql.graft.Bridge.flatten]]:
  * the cache is built through the normal AQE path, then the returned
  * frame is a LogicalRDD LEAF reading through that cache. Without the
  * flatten, memoized tables nest each other's logical plans and every
  * downstream action re-walks the shared DAG as a tree — driver-side
  * analysis measured in SECONDS per action at memo depth 4+ (see
  * Bridge.flatten). With it, consumers of a memo see a one-node plan
  * regardless of how the table was derived.
  */
object Materialize {
  def table(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val cached = df.persist(level)
    cached.count()
    org.apache.spark.sql.graft.Bridge.flatten(cached)
  }
}
