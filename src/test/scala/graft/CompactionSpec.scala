package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction (the nightly OPTIMIZE pass): a deliberately fragmented
  * day layout is rewritten into size-targeted files with the partition
  * directories, row content and directory pruning all preserved, and
  * the per-day file count exactly ceil(rows/target) in the
  * one-task-per-day mode.
  */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.sources.Compaction

  private def checksum(path: String): (Long, Long) = {
    val df = spark.read.parquet(path)
    val r = df.agg(count(lit(1)),
      sum(pmod(xxhash64(df.columns.sorted.map(col): _*), lit(1000003L))))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  test("compaction hits exact per-day file counts, preserves content and pruning") {
    import spark.implicits._
    val frag = java.nio.file.Files
      .createTempDirectory("graft-compact-in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-compact-out").toString
    val ev = Tables(spark, sf).events
      .withColumn("event_date", to_date(col("ts")))
    // fragment: an explicit numbered round-robin shuffle (which AQE
    // never coalesces) spreads every day across 16 writer tasks — the
    // exact way un-clustered appends fragment a real layout
    ev.repartition(16)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date").parquet(frag)
    val before = Compaction.partitionFiles(spark, frag)
    assert(before.nonEmpty && before.exists(_.files > 4),
      s"fixture should be fragmented: $before")

    val target = 1000
    val report = Compaction
      .compactDayLayout(spark, frag, out, maxRecordsPerFile = target)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3))).toMap
    val rowsPerDay = ev.groupBy(date_format(col("event_date"),
        "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    rowsPerDay.foreach { case (d, n) =>
      val key = s"event_date=$d"
      val want = (n + target - 1) / target
      assert(report(key)._2 == want,
        s"$key: files_after ${report(key)._2}, want $want (rows $n)")
      assert(report(key)._1 >= report(key)._2)
    }
    // content preserved bit-for-bit (order-free checksum)
    assert(checksum(frag) == checksum(out))
    // directory pruning still holds on the compacted layout
    val minDay = rowsPerDay.keys.min
    val scan = spark.read.parquet(out)
      .filter(col("event_date") === lit(minDay))
      .queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.totalNumberOfFiles
      }
    val wantFiles = (rowsPerDay(minDay) + target - 1) / target
    assert(scan.nonEmpty && scan.head == wantFiles,
      s"pruned scan files: $scan, want $wantFiles")
  }

  test("hot-day salt splits a day across tasks within the file-count bound") {
    val frag = java.nio.file.Files
      .createTempDirectory("graft-compact-hot-in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-compact-hot-out").toString
    val ev = Tables(spark, sf).events
      .withColumn("event_date", to_date(col("ts")))
    ev.repartition(col("event_date"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date").parquet(frag)
    val target = 500
    val tasks = 4
    val report = Compaction.compactDayLayout(spark, frag, out,
        maxRecordsPerFile = target, tasksPerDay = tasks,
        saltCols = Seq("user_id", "ts"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    import spark.implicits._
    val rowsPerDay = ev.groupBy(date_format(col("event_date"),
        "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    rowsPerDay.foreach { case (d, n) =>
      val got = report(s"event_date=$d")
      val lo = (n + target - 1) / target
      assert(got >= lo && got <= lo + (tasks - 1),
        s"$d: files $got outside [$lo, ${lo + tasks - 1}] (rows $n)")
    }
    assert(checksum(frag) == checksum(out))
  }
}
