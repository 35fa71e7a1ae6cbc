package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-time boilerplate gate: arriving docs are scrubbed against
  * the LOADED line-frequency artifact (the CCNet deployment shape —
  * compute frequencies nightly over the crawl, filter at ingest), and
  * the streaming report is doc-for-doc identical to the batch
  * `d_line_dedup` on the real corpus.
  */
class BoilerGateStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Curation

  test("planted banner is scrubbed at ingest; novel segments pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // banner "cookie notice accept" opens 3 docs -> boilerplate at
    // minDocs=3; each doc also has unique tail content that must stay
    val banner = "cookie notice accept"
    val base = (0L until 3L)
      .map(i => (i, s"$banner page body $i"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-boiler-index").toString
    assert(Curation.writeBoilerIndex(base, path) == 1L)
    val boiler = Curation.loadBoilerIndex(spark, path)

    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val in = MemoryStream[(Long, Timestamp, String)]
    in.addData(
      (100L, t0, s"$banner fresh unique content"), // banner + 3 kept
      (101L, t0, "entirely novel text here"))      // nothing scrubbed
    val q = graft.streaming.EventStreams.boilerGateStream(
        in.toDF().toDF("doc_id", "ts", "text"), boiler)
      .writeStream.outputMode("append").format("memory")
      .queryName("boiler_gate_out").start()
    q.processAllAvailable()
    // watermark pusher so the t0 groups finalize
    in.addData((102L, Timestamp.valueOf("2024-01-01 11:30:00"), "x y z"))
    q.processAllAvailable(); q.stop()
    val out = spark.table("boiler_gate_out")
      .filter($"doc_id" < 102)
      .select($"doc_id", $"n_tokens", $"n_boiler_segments",
        $"tokens_kept", $"kept_md5")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.toSeq == Seq(
      (100L, 6L, 1L, 3L, md5("fresh unique content")),
      (101L, 4L, 0L, 4L, md5("entirely novel text here"))), out.toSeq)
  }

  test("stream report equals batch d_line_dedup doc-for-doc on the real corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables(spark, sf).documents
    val path = java.nio.file.Files
      .createTempDirectory("graft-boiler-real").toString
    assert(Curation.writeBoilerIndex(docs, path) > 0L)
    val boiler = Curation.loadBoilerIndex(spark, path)

    val rows = docs.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val in = MemoryStream[(Long, Timestamp, String)]
    in.addData(rows.map { case (id, tx) => (id, t0, tx) }.toSeq)
    val q = graft.streaming.EventStreams.boilerGateStream(
        in.toDF().toDF("doc_id", "ts", "text"), boiler)
      .writeStream.outputMode("append").format("memory")
      .queryName("boiler_gate_real").start()
    q.processAllAvailable()
    in.addData((-1L, Timestamp.valueOf("2024-01-01 12:00:00"), "w m k"))
    q.processAllAvailable(); q.stop()

    val got = spark.table("boiler_gate_real")
      .filter($"doc_id" >= 0)
      .select($"doc_id", $"n_tokens", $"n_segments", $"n_boiler_segments",
        $"tokens_kept", $"kept_md5")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    val want = Curation.lineDedup(spark, sf)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == want.size)
    assert(want.forall { case (id, w) => got(id) == w },
      want.collect { case (id, w) if got(id) != w =>
        s"$id: got ${got(id)}, want $w" }.take(3).mkString("; "))
    // non-degenerate: the gate actually scrubbed something
    assert(got.values.exists(_._4 > 0))
  }
}
