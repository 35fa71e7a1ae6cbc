package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of the persisted-band-index probe: arriving docs
  * band map-side and stream-static join the LOADED index artifact —
  * a planted re-crawl of an indexed template is flagged (one hit row,
  * est 1.0), a novel doc passes silently, and the whole probe runs
  * append-mode with watermark-bounded state. */
class IndexProbeStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Dedup

  test("stream probe against the loaded band index flags planted dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a tiny indexed base corpus: 5 template groups of 8 copies
    val base = (0L until 40L)
      .map(i => (i, (0 until 20).map(j => s"b${i % 5}t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-stream-index").toString
    Dedup.writeBandIndex(base, path)
    val idx = Dedup.loadBandIndex(spark, path)
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val in = MemoryStream[(Long, Timestamp, String)]
    in.addData(
      (100L, t0, (0 until 20).map(j => s"b2t$j").mkString(" ")), // re-crawl
      (101L, t0, (0 until 20).map(j => s"newdoc$j").mkString(" "))) // novel
    val q = graft.streaming.EventStreams.indexProbeStream(
        in.toDF().toDF("doc_id", "ts", "text"), idx)
      .writeStream.outputMode("append").format("memory")
      .queryName("index_probe_out").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("index_probe_out")
      .select($"doc_id", $"est_jaccard")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((100L, 1.0)), s"got $out")
  }
}
