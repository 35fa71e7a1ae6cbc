package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file COMPACTION over a hive day-partitioned parquet layout —
  * the OPTIMIZE pass every lakehouse runs nightly: streaming ingest
  * and incremental appends fragment partitions into many small files,
  * and scan cost at 100 TB is dominated by file-open/footer overhead
  * long before bytes (a 10k-file day reads slower than the same bytes
  * in 10 files). Compaction rewrites each partition into
  * size-targeted files while PRESERVING the partition directories
  * (so [[ZOrder.dayPruningReport]]'s directory pruning keeps holding)
  * and the row content (checksum-verified in the spec).
  *
  * Mechanics: one shuffle keyed by the partition column routes every
  * row of a day to one task (plus an optional deterministic
  * xxhash64 salt for days too hot for a single task), and the
  * standard `maxRecordsPerFile` writer knob splits the output at the
  * target — so files-per-day is exactly ceil(rows/target) at
  * `tasksPerDay = 1`, and bounded by that plus (tasksPerDay − 1)
  * otherwise. The file listing is driver-side METADATA (one status
  * call per file — at 100 TB this is the object-store manifest scan
  * every OPTIMIZE implementation performs, never data).
  */
object Compaction {

  final case class PartitionFiles(partition: String, files: Long,
                                  bytes: Long)

  /** Per-partition-directory file census of a hive layout. */
  def partitionFiles(spark: SparkSession, path: String): Seq[PartitionFiles] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.isDirectory)
      .map { d =>
        val files = fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        PartitionFiles(d.getPath.getName, files.length.toLong,
          files.map(_.getLen).sum)
      }.toSeq.sortBy(_.partition)
  }

  /** Rewrite the day-partitioned layout at `inPath` into
    * `maxRecordsPerFile`-sized files under `outPath`, returning the
    * per-partition before/after report. `saltCols` + `tasksPerDay`
    * split a hot day across several writer tasks (deterministic
    * xxhash64 routing — no RNG). */
  def compactDayLayout(spark: SparkSession, inPath: String, outPath: String,
                       maxRecordsPerFile: Int, partCol: String = "event_date",
                       tasksPerDay: Int = 1,
                       saltCols: Seq[String] = Nil): DataFrame = {
    require(maxRecordsPerFile >= 1 && tasksPerDay >= 1)
    val before = partitionFiles(spark, inPath)
    val df = spark.read.parquet(inPath)
    val keys =
      if (tasksPerDay == 1 || saltCols.isEmpty) Seq(col(partCol))
      else Seq(col(partCol),
        pmod(xxhash64(saltCols.map(col): _*), lit(tasksPerDay)))
    df.repartition(keys: _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partCol)
      .parquet(outPath)
    val after = partitionFiles(spark, outPath)
    import spark.implicits._
    val b = before.toDF("partition", "files_before", "bytes_before")
    val a = after.toDF("partition", "files_after", "bytes_after")
    b.join(a, Seq("partition"), "full")
      .na.fill(0L, Seq("files_before", "files_after"))
      .orderBy("partition")
  }
}
