package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) file layout — the 100 TB mechanic for
  * MULTI-column scan pruning, complementing [[Bucketing]] (which
  * serves one join key): interleaving the bits of two sort keys makes
  * every output file cover a small RECTANGLE of the (a, b) key space,
  * so parquet footer min/max stats prune files for predicates on
  * EITHER column — a linear sort by `a` gives perfect pruning on `a`
  * and none on `b` (every file spans b's full range).
  *
  * The z-value is pure Column bit arithmetic (the classic
  * spread-bits-then-interleave trick), so it stays inside whole-stage
  * codegen — no UDF, no custom expression needed. Keys are rank-
  * compressed to 32 bits via a cheap proportional mapping when they
  * exceed the bit budget; for pruning, PRESERVING ORDER is all that
  * matters, not bijectivity.
  */
object ZOrder {

  /** Write `df` hive-partitioned by the DAY of `tsCol` — the third leg
    * of the layout trio (hash buckets for join keys, z-order for
    * multi-column range predicates, date partitions for time-range
    * scans): a time-bounded query reads only its days' directories,
    * enforced by Catalyst PartitionFilters BEFORE any file is opened.
    * At 100 TB with a year of events, a 7-day dashboard query touches
    * ~2% of the files — directory pruning, not footer pruning. */
  def writeDayPartitioned(df: DataFrame, path: String,
                          tsCol: String = "ts"): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(path)

  // one written day layout per (session, dir); every pruning query
  // then measures the SAME artifact
  private val dayLayoutCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Directory-pruning PROOF query over the day-partitioned layout —
    * the layout trio's first driver-oracled entry (they were spec-only
    * through r8): write the events table hive-partitioned by day with
    * EXACTLY one file per day directory (each date hash-repartitions
    * to one task before `partitionBy`), then measure, from the live
    * Catalyst scan, how many files a 7-day predicate actually touches.
    *
    * Output (one row): days_total, files_total (= days_total — the
    * one-file-per-day layout contract), days_selected (the predicate's
    * days), files_pruned (what `FileSourceScanExec.selectedPartitions`
    * reports AFTER PartitionFilters — the measured scan set). The
    * DuckDB oracle derives all four from the raw events dates alone,
    * so a hash match proves Catalyst pruned the listing to exactly the
    * predicate's directories — no file outside the 7 days is opened,
    * the property that makes a 7-day dashboard query read ~2% of a
    * year-scale corpus. */
  def dayPruningReport(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables(spark, dir).events
    val path = dayLayoutCache.getOrElseUpdate(
      graft.GraftSession.sessionKey(spark, dir), {
        val p = java.nio.file.Files
          .createTempDirectory("graft-day-layout").toString
        ev.withColumn("event_date", to_date(col("ts")))
          .repartition(col("event_date"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("event_date").parquet(p)
        p
      })
    val full = spark.read.parquet(path)
    val filesTotal = full.inputFiles.length.toLong
    val lo = ev.agg(min(to_date(col("ts")))).head().getDate(0)
    val fdf = full.filter(
      col("event_date").between(lit(lo), date_add(lit(lo), 6)))
    // the MEASURED post-pruning file set: selectedPartitions is the
    // driver-side listing after PartitionFilters, before any file opens
    val filesPruned = fdf.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }.sum
    val daysTotal = full.select("event_date").distinct().count()
    val daysSelected = fdf.select("event_date").distinct().count()
    Seq((daysTotal, filesTotal, daysSelected, filesPruned))
      .toDF("days_total", "files_total", "days_selected", "files_pruned")
  }

  /** Spread the low 32 bits of `x` to the even bit positions of a
    * 64-bit value (0b...b2 b1 b0 → 0b...b2 0 b1 0 b0). */
  private def spread(x: Column): Column = {
    // magic-mask doubling, 5 steps: 16, 8, 4, 2, 1
    val s1 = x.bitwiseAND(lit(0xFFFFFFFFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val s4 = (s3.bitwiseOR(shiftleft(s3, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val s5 = (s4.bitwiseOR(shiftleft(s4, 2))).bitwiseAND(lit(0x3333333333333333L))
    (s5.bitwiseOR(shiftleft(s5, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton code of two NON-NEGATIVE 32-bit keys: bits of `a`
    * on even positions, bits of `b` on odd. Order-preserving along
    * both axes. */
  def zValue(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** Write `df` z-ordered on (`colA`, `colB`): range-partition by the
    * Morton code into `files` output files, sort within each — every
    * file's (a, b) footer stats cover a bounded rectangle. The write
    * is the one sort the layout ever pays; every later scan with a
    * predicate on either column prunes at the footer.
    *
    * Both keys are first NORMALIZED to a common 16-bit scale from
    * their (min, max) — interleaving raw values would let the
    * wider-ranged column's high bits dominate the curve and erase the
    * other column's locality (measured: partkey spans collapsed from
    * ~full-range to a bounded rectangle once normalized). The one
    * extra min/max aggregate is a cheap footer-stats-style pass. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String, files: Int = 16): Unit = {
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double")))
      .collect()(0)
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else ((c.cast("double") - lit(lo)) * lit(65535.0 / (hi - lo)))
        .cast("long")
    val z = zValue(norm(col(colA), r.getDouble(0), r.getDouble(1)),
      norm(col(colB), r.getDouble(2), r.getDouble(3)))
    df.withColumn("_z", z)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
