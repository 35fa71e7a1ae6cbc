package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew tooling: detect hot keys and join through them without a
  * straggler task.
  *
  * At 100 TB a single hot key (one viral product, one bot user) turns
  * a shuffle join into one task holding the whole key's data — AQE's
  * skew-join split handles sort-merge cases automatically (enabled in
  * GraftSession), but a REPLICATED salt join is the explicit fix when
  * the small side fits memory and the skew is extreme. These helpers
  * make both halves first-class: [[keySkew]] is the detection query,
  * [[saltedJoin]] the remediation.
  */
object Skew {

  /** Salted equi-join: scatter the big side's rows across `salt`
    * sub-keys, replicate the small side once per sub-key, join on
    * (key, salt). The hot key's rows now land on `salt` tasks instead
    * of one; the small side grows ×salt (bounded — it's the small
    * side), and the result is EXACTLY the plain join's multiset (the
    * scatter value never reaches the output).
    *
    * The scatter is `monotonically_increasing_id % salt` — cheap,
    * uniform within partitions, and correctness-neutral (any
    * assignment yields the same join result; only load balance
    * changes). Supports inner and left joins — the shapes where the
    * big side's rows must all survive per-salt. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, not $joinType")
    val saltCol = "__graft_salt"
    val saltedBig = big.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val replicated = small.withColumn(saltCol,
      explode(lit((0L until salt.toLong).toArray)))
    saltedBig.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }

  /** Key-skew diagnostic for an equi-join key: distinct keys, hottest
    * key, max/mean frequency ratio. A ratio ≫ 1 on a planned shuffle
    * key is the signal to salt (or trust AQE's split if sort-merge).
    * One map-side-combined count per key + a 1-row reduce. */
  def keySkew(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("k"))
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        max(struct(col("n"), col("k"))).as("hot"),
        sum("n").as("n_rows"))
      .select(col("n_keys"), col("hot.k").as("hottest_key"),
        col("hot.n").as("max_n"),
        round(col("n_rows") / col("n_keys").cast("double"), 4).as("avg_n"),
        round(col("hot.n") * col("n_keys") / col("n_rows").cast("double"), 4)
          .as("skew_ratio"))

  /** The skew report for the co-purchase join key (l_partkey) — the
    * query-surface entry of [[keySkew]]. */
  def qKeySkew(spark: SparkSession, dir: String): DataFrame =
    keySkew(Tables(spark, dir).lineitem, col("l_partkey"))
}
