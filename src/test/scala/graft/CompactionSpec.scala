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

  test("tasksPerDay without saltCols defaults to an all-column salt (no silent no-op)") {
    val frag = java.nio.file.Files
      .createTempDirectory("graft-compact-salt-in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-compact-salt-out").toString
    val ev = Tables(spark, sf).events
      .withColumn("event_date", to_date(col("ts")))
    ev.repartition(col("event_date"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date").parquet(frag)
    // r10 behavior: tasksPerDay=4 with default saltCols silently
    // compacted at 1 task/day. Now the salt defaults to all columns:
    // a day with >1 distinct row must spread across MULTIPLE files
    // even though rows-per-day is far below the records target.
    val report = Compaction.compactDayLayout(spark, frag, out,
        maxRecordsPerFile = 1000000, tasksPerDay = 4)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(report.values.exists(_ > 1),
      s"default salt produced no split anywhere: $report")
    assert(report.values.forall(_ <= 4))
    assert(checksum(frag) == checksum(out))
  }

  test("in-place compaction is rejected up front") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-compact-self").toString
    intercept[IllegalArgumentException] {
      Compaction.compactDayLayout(spark, p, p, maxRecordsPerFile = 10)
    }
  }

  test("bytes mode derives records-per-file and lands in the size envelope") {
    val frag = java.nio.file.Files
      .createTempDirectory("graft-compact-bytes-in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-compact-bytes-out").toString
    val ev = Tables(spark, sf).events
      .withColumn("event_date", to_date(col("ts")))
    ev.repartition(8)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date").parquet(frag)
    val target = 64L * 1024 // 64 KB target files
    Compaction.compactDayLayoutBytes(spark, frag, out, target)
    assert(checksum(frag) == checksum(out))
    val after = Compaction.partitionFiles(spark, out)
    // every day collapses to few files, and each day's MEAN file size
    // sits inside a generous codec-variation envelope of the target;
    // the final file of a day is a remainder and may be small, so the
    // envelope is per-day mean, lower-bounded only for days with >1
    // file (a 1-file day just didn't reach the target)
    after.foreach { p =>
      val mean = p.bytes.toDouble / p.files
      assert(mean <= target * 3,
        s"${p.partition}: mean file ${mean.toLong} far above target")
      if (p.files > 1)
        assert(mean >= target / 4,
          s"${p.partition}: ${p.files} files, mean ${mean.toLong} — " +
            "over-fragmented vs the byte target")
    }
    // the byte mode must actually defragment the fixture
    val before = Compaction.partitionFiles(spark, frag)
    assert(after.map(_.files).sum < before.map(_.files).sum,
      s"bytes mode did not compact: ${before.map(_.files).sum} -> " +
        s"${after.map(_.files).sum}")
  }
}
