package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of the persisted-band-index probe: arriving docs
  * band map-side and stream-static join the LOADED index artifact —
  * a planted re-crawl of an indexed template is flagged (one hit row,
  * deterministic max est), a novel doc passes silently, and the whole
  * probe runs append-mode with watermark-bounded state. Also drives
  * the r10 GENERATION ROTATION cycle end-to-end: gen=N layout, probe
  * restart via rotateIndexProbe with a checkpoint (no reprocessing,
  * no loss), a dup only findable through gen-2. */
class IndexProbeStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Dedup

  private def text(tmpl: String): String =
    (0 until 20).map(j => s"$tmpl$j").mkString(" ")

  test("stream probe against the loaded band index flags planted dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a tiny indexed base corpus: 5 template groups of 8 copies
    val base = (0L until 40L)
      .map(i => (i, text(s"b${i % 5}t")))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-stream-index").toString
    Dedup.writeBandIndex(base, path)
    val idx = Dedup.loadBandIndex(spark, path)
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val in = MemoryStream[(Long, Timestamp, String)]
    in.addData(
      (100L, t0, text("b2t")), // re-crawl of an indexed template
      (101L, t0, text("newdoc"))) // novel
    val q = graft.streaming.EventStreams.indexProbeStream(
        in.toDF().toDF("doc_id", "ts", "text"), idx)
      .writeStream.outputMode("append").format("memory")
      .queryName("index_probe_out").start()
    q.processAllAvailable()
    // watermark pusher: the hit's (doc_id, ts) group finalizes once
    // the watermark passes t0
    in.addData((102L, Timestamp.valueOf("2024-01-01 11:30:00"),
      text("alsonovel")))
    q.processAllAvailable(); q.stop()
    val out = spark.table("index_probe_out")
      .select($"doc_id", $"est_jaccard")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((100L, 1.0)), s"got $out")
  }

  test("multi-rep hits collapse to the deterministic MAX estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // gen 1: template A; gen 2: a near-dup template (A plus one extra
    // token — est 0.9375, shares bands with A under the portable
    // minhash) — generation-local rep collapse gives TWO qualifying
    // reps for a probe of A's exact text, at est 1.0 and est < 1. The
    // stream must emit max = 1.0, never the arbitrary row the old
    // dropDuplicatesWithinWatermark kept.
    val root = java.nio.file.Files
      .createTempDirectory("graft-rot-multirep").toString
    val a = text("sharedTok")
    val b = a + " extraTok"
    assert(Dedup.writeIndexGeneration(
      Seq((1L, a), (2L, a)).toDF("doc_id", "text"), root) == 1L)
    assert(Dedup.writeIndexGeneration(
      Seq((10L, b), (11L, b)).toDF("doc_id", "text"), root) == 2L)
    val idx = Dedup.loadBandIndexGenerations(spark, root)
    // guard: the batch probe at the stream's threshold must see BOTH
    // generations' members — otherwise this test isn't multi-rep
    val probeDf = Seq((100L, a)).toDF("doc_id", "text")
    val batchHits = Dedup.deltaDupPairs(idx, probeDf, threshold = 0.5)
      .select("base_id").as[Long].collect().toSet
    assert(batchHits == Set(1L, 2L, 10L, 11L),
      s"crafting failed, batch probe hit only $batchHits")
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val in = MemoryStream[(Long, Timestamp, String)]
    in.addData((100L, t0, a))
    val q = graft.streaming.EventStreams.indexProbeStream(
        in.toDF().toDF("doc_id", "ts", "text"), idx, threshold = 0.5)
      .writeStream.outputMode("append").format("memory")
      .queryName("index_probe_multirep").start()
    q.processAllAvailable()
    in.addData((101L, Timestamp.valueOf("2024-01-01 11:30:00"),
      text("novel")))
    q.processAllAvailable(); q.stop()
    val out = spark.table("index_probe_multirep")
      .select($"doc_id", $"est_jaccard")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((100L, 1.0)), s"got $out")
  }

  test("generation rotation: restart finds gen-2 dups, reprocesses nothing") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-rot-index").toString
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-rot-src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-rot-ckpt").toString
    // night 1: index the base corpus as gen=1
    val base = (0L until 40L).map(i => (i, text(s"b${i % 5}t")))
      .toDF("doc_id", "text")
    assert(Dedup.writeIndexGeneration(base, root) == 1L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]
    def start(idx: Dedup.BandIndex) =
      graft.streaming.EventStreams.indexProbeStream(
          spark.readStream.schema(schema).parquet(srcDir), idx)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("doc_id", "est_jaccard").collect()
            .foreach(r => hits.add((r.getLong(0), r.getDouble(1))))
        }.start()
    def addFile(n: Int, rows: (Long, String, String)*): Unit =
      rows.map { case (id, ts, tx) => (id, Timestamp.valueOf(ts), tx) }
        .toDF("doc_id", "ts", "text")
        .coalesce(1).write.mode("append").parquet(srcDir)
    // phase 1 against gen=1
    var q = graft.streaming.EventStreams.rotateIndexProbe(
      None, spark, root, start)
    addFile(1, (100L, "2024-01-01 10:00:00", text("b2t")),
      (101L, "2024-01-01 10:00:00", text("newdoc")))
    q.processAllAvailable()
    addFile(2, (102L, "2024-01-01 11:30:00", text("alsonovel")))
    q.processAllAvailable()
    assert(hits.toArray.toSeq == Seq((100L, 1.0)), s"phase 1: $hits")
    // night 2: a NEW template arrives; ONLY the day-2 slice is signed
    // (writeIndexGeneration never reads the base corpus), then the
    // probe rotates onto the gen={1,2} union
    val day2 = (200L until 210L).map(i => (i, text("c0t")))
      .toDF("doc_id", "text")
    assert(Dedup.writeIndexGeneration(day2, root) == 2L)
    q = graft.streaming.EventStreams.rotateIndexProbe(
      Some(q), spark, root, start)
    // a dup findable ONLY through gen-2, plus a re-check that gen-1
    // templates still hit through the union
    addFile(3, (300L, "2024-01-01 12:00:00", text("c0t")),
      (301L, "2024-01-01 12:00:00", text("b4t")),
      (302L, "2024-01-01 12:00:00", text("stillnovel")))
    q.processAllAvailable()
    addFile(4, (303L, "2024-01-01 13:30:00", text("sentinel")))
    q.processAllAvailable(); q.stop()
    val got = hits.toArray.toSeq.asInstanceOf[Seq[(Long, Double)]].sorted
    // 100 exactly once (checkpoint resumed — files 1-2 not replayed),
    // 300 via gen-2, 301 via gen-1 through the rotated union
    assert(got == Seq((100L, 1.0), (300L, 1.0), (301L, 1.0)),
      s"rotation cycle diverged: $got")
  }
}
