package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Two-phase distributed global ordering primitives.
  *
  * `row_number()/sum().over(Window.orderBy(...))` with no PARTITION BY
  * funnels the ENTIRE table through one reducer — the single-partition
  * sort that kills plans at 10⁹ rows (the same failure mode the
  * attack-robustness rework removed). These helpers compute the same
  * global rank / running sum with every partition working:
  *
  *   1. range-repartition on the sort key (Spark's RangePartitioner
  *      samples boundaries; the caller's tie-break column makes the
  *      order total) + partition-local sort — the ONE shuffle;
  *   2. a per-partition imperative prefix scan (`mapPartitions` — the
  *      sanctioned use: running state per partition IS the algorithm;
  *      a `Window.partitionBy(pid)` would re-shuffle the whole table a
  *      second time just to re-cluster what is already clustered);
  *   3. per-partition (row count, weight sum) totals — `numParts` rows
  *      — to the driver, cumulative offsets, broadcast back, added.
  *
  * Driver state is O(numParts), data motion is the one range exchange.
  * This is the classic distributed prefix sum (Blelloch scan) on
  * DataFrames.
  */
object Distributed {

  /** Adds `rankName` (1-based global rank in `sortCols` order) and
    * `cumName` (inclusive global prefix sum of `weight`, which must be
    * integral — exact-integer discipline: long prefix sums are
    * order-free and engine-portable, double ones are neither).
    * `sortCols` must define a TOTAL order (include a tie-break key). */
  def rankedPrefix(df: DataFrame, sortCols: Seq[Column], weight: Column,
                   rankName: String = "g_rank", cumName: String = "g_cum",
                   numParts: Int = 32,
                   scope: graft.Materialize.Scoped = null): DataFrame =
    rankedPrefixWithTotals(df, sortCols, weight, rankName, cumName,
      numParts, scope)._1

  /** [[rankedPrefix]] plus the (row count, weight sum) totals the
    * offset pass already computed — callers that need N (ntile) get it
    * for free instead of paying another pass over the input. */
  private def rankedPrefixWithTotals(
      df: DataFrame, sortCols: Seq[Column], weight: Column,
      rankName: String, cumName: String,
      numParts: Int,
      scope: graft.Materialize.Scoped): (DataFrame, Long, Long) = {
    val spark = df.sparkSession
    val in = df.withColumn("_dp_w", weight.cast("long"))
    val sorted = in.repartitionByRange(numParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val outSchema = StructType(in.schema.fields ++ Seq(
      StructField("_dp_pid", LongType, nullable = false),
      StructField("_dp_lrank", LongType, nullable = false),
      StructField("_dp_lcum", LongType, nullable = false)))
    val wIdx = in.schema.fieldIndex("_dp_w")
    val localized = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var r = 0L
      var c = 0L
      it.map { row =>
        r += 1
        c += (if (row.isNullAt(wIdx)) 0L else row.getLong(wIdx))
        Row.fromSeq(row.toSeq :+ pid :+ r :+ c)
      }
    }(Encoders.row(outSchema))
    // one materialization serves the totals pass AND the caller's read.
    // Query-local callers pass their Scoped so the blocks are freed
    // with the query (the no-leak discipline).
    val local = if (scope != null) scope.table(localized)
      else graft.Materialize.table(localized)
    // per-partition totals: numParts rows to the driver, never row data
    val totals = local.groupBy(col("_dp_pid"))
      .agg(max("_dp_lrank").as("n"), max("_dp_lcum").as("w"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var (accN, accW) = (0L, 0L)
    val offsets = totals.map { case (p, n, w) =>
      val o = (p, accN, accW); accN += n; accW += w; o
    }.toSeq
    import spark.implicits._
    val offDf = broadcast(
      offsets.toDF("_dp_pid_o", "_dp_prev_n", "_dp_prev_w"))
    val out = local
      .join(offDf, col("_dp_pid") === col("_dp_pid_o"))
      .withColumn(rankName, col("_dp_lrank") + col("_dp_prev_n"))
      .withColumn(cumName, col("_dp_lcum") + col("_dp_prev_w"))
      .drop("_dp_pid", "_dp_pid_o", "_dp_lrank", "_dp_lcum",
        "_dp_prev_n", "_dp_prev_w", "_dp_w")
    (out, accN, accW)
  }

  /** SQL `ntile(n) OVER (ORDER BY sortCols)` without the global
    * single-partition window. Bucket sizes follow the SQL rule: with
    * N rows, the first N mod n buckets get ⌈N/n⌉ rows, the rest
    * ⌊N/n⌋ — derived arithmetically from the two-phase global rank. */
  def ntile(df: DataFrame, sortCols: Seq[Column], n: Int,
            bucketName: String, numParts: Int = 32,
            scope: graft.Materialize.Scoped = null): DataFrame = {
    // N comes from the offsets pass already inside rankedPrefix — no
    // second pass over the input
    val (ranked, total, _) = rankedPrefixWithTotals(df, sortCols, lit(1L),
      rankName = "_dp_grank", cumName = "_dp_gcum", numParts = numParts,
      scope = scope)
    val q = total / n
    val rem = total % n
    // pure integer arithmetic (`div`), no double division: exact at any
    // N. ceil(r/d) = (r + d - 1) div d.
    val qSafe = math.max(q, 1L) // else-branch is unreachable when q = 0
    val bucket =
      when(col("_dp_grank") <= lit(rem * (q + 1)),
        expr(s"(_dp_grank + $q) div ${q + 1}"))
        .otherwise(expr(
          s"$rem + (_dp_grank - ${rem * (q + 1)} + ${qSafe - 1}) div $qSafe"))
    ranked.withColumn(bucketName, bucket)
      .drop("_dp_grank", "_dp_gcum")
  }
}
