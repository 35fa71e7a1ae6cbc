package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantic probe against the PERSISTED vector index (r11,
  * VERDICT r10 "Next #1"): the probe survives across queries without
  * retraining — centroids and members come from the loaded parquet
  * artifact — and the nightly generation rotation reaches the stream
  * through rotateSemanticProbe with its checkpoint intact (no
  * reprocessing, no loss; a dup findable only through gen-2 after the
  * rotation). Also pins loaded-index probe ≡ session-trained probe on
  * the real sf corpus (the two dataflows must agree doc-for-doc when
  * the artifact is written from the same corpus). */
class SemanticIndexStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  private def vec(i: Long): Array[Float] =
    Array.tabulate(64)(j => math.sin(i.toDouble * 64 + j).toFloat)

  test("loaded-index probe == session-trained probe on the sf corpus") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-sem-idx-eq").toString
    graft.operators.AnnIndex.writeVectorIndex(
      Tables(spark, sf).embeddings, root)
    val idx = graft.operators.AnnIndex.loadVectorIndex(spark, root)
    val corpus = Tables(spark, sf).embeddings
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val probeDf = Seq(
      (9005L, t0, corpus(5L)),
      (9007L, t0, corpus(7L).map(x => x * 3.0f)),
      (9003L, t0, corpus(3L))).toDF("vec_id", "ts", "embedding")
    // both twins in batch mode: identical expressions, different index
    // provenance (session memo vs loaded artifact)
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"max_cos", $"n_matches")
      .as[(Long, Double, Long)].collect().toSet
    val session = run(graft.streaming.EventStreams
      .semanticProbeStream(probeDf, spark, sf, threshold = 0.35))
    val loaded = run(graft.streaming.EventStreams
      .semanticProbeStreamIndexed(probeDf, idx, threshold = 0.35))
    assert(session.nonEmpty)
    assert(loaded == session,
      s"loaded-index probe diverges:\n got=$loaded\n want=$session")
  }

  test("adcSearchStream == knnIndexed batch twin; streams end-to-end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft-adc-stream").toString
    graft.operators.AnnIndex.writeVectorIndex(
      Tables(spark, sf).embeddings, root)
    val idx = graft.operators.AnnIndex.loadVectorIndex(spark, root)
    val corpus = Tables(spark, sf).embeddings
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val qids = Seq(3L, 7L, 12L)
    // batch reference: the loaded-index ADC search
    val want = graft.operators.AnnIndex.knnIndexed(idx,
        qids.map(q => (q, corpus(q))).toDF("query_id", "q_emb"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2),
        r.getLong(3))).toSet
    assert(want.size == qids.size * 10)
    // batch-mode twin of the stream dataflow (same expressions)
    val probeDf = qids.map(q => (q, t0, corpus(q)))
      .toDF("vec_id", "ts", "embedding")
    val batchTwin = graft.streaming.EventStreams
      .adcSearchStream(probeDf, idx)
      .select($"query_id", $"rank", $"neighbor_id", $"adc_d2")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2),
        r.getLong(3))).toSet
    assert(batchTwin == want,
      s"stream dataflow diverges from knnIndexed:\n got=$batchTwin\n want=$want")
    // and the real stream emits the same rows once the watermark passes
    val in = MemoryStream[(Long, Timestamp, Array[Float])]
    in.addData(qids.map(q => (q, t0, corpus(q))): _*)
    val q = graft.streaming.EventStreams.adcSearchStream(
        in.toDF().toDF("vec_id", "ts", "embedding"), idx)
      .writeStream.outputMode("append").format("memory")
      .queryName("adc_search_out").start()
    q.processAllAvailable()
    in.addData((9999L, Timestamp.valueOf("2024-01-01 11:30:00"),
      Array.fill(64)(0.0f)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("adc_search_out")
      .filter($"query_id".isin(qids: _*))
      .select($"query_id", $"rank", $"neighbor_id", $"adc_d2")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want,
      s"stream diverged from batch:\n got=$got\n want=$want")
  }

  test("generation rotation: restart probes gen-2, reprocesses nothing") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-sem-idx-rot").toString
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-sem-idx-src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sem-idx-ckpt").toString
    // night 1: train + write the base artifact (gen=1)
    graft.operators.AnnIndex.writeVectorIndex(
      (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding"), root)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]
    def start(idx: graft.operators.AnnIndex.VectorIndex) =
      graft.streaming.EventStreams.semanticProbeStreamIndexed(
          spark.readStream.schema(schema).parquet(srcDir), idx,
          threshold = 0.999)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("vec_id", "max_cos").collect()
            .foreach(r => hits.add((r.getLong(0), r.getDouble(1))))
        }.start()
    def addFile(rows: (Long, String, Array[Float])*): Unit =
      rows.map { case (id, ts, e) => (id, Timestamp.valueOf(ts), e) }
        .toDF("vec_id", "ts", "embedding")
        .coalesce(1).write.mode("append").parquet(srcDir)
    // phase 1 against gen=1
    var q = graft.streaming.EventStreams.rotateSemanticProbe(
      None, spark, root, start)
    addFile((100L, "2024-01-01 10:00:00", vec(5L)), // re-arrival of base 5
      (101L, "2024-01-01 10:00:00",
        Array.tabulate(64)(j => if (j == 0) 1f else 0f))) // novel
    q.processAllAvailable()
    addFile((102L, "2024-01-01 11:30:00",
      Array.tabulate(64)(j => if (j == 1) 1f else 0f))) // watermark pusher
    q.processAllAvailable()
    assert(hits.toArray.toSeq == Seq((100L, 1.0)), s"phase 1: $hits")
    // night 2: a NEW vector family arrives; ONLY that slice is encoded
    // (the model is untouched), then the probe rotates onto gen={1,2}
    assert(graft.operators.AnnIndex.writeVectorGeneration(
      (1000L until 1010L).map(i => (i, vec(i * 7L)))
        .toDF("vec_id", "embedding"), root) == 2L)
    q = graft.streaming.EventStreams.rotateSemanticProbe(
      Some(q), spark, root, start)
    // a dup findable ONLY through gen-2, plus a gen-1 re-check
    addFile((300L, "2024-01-01 12:00:00", vec(1005L * 7L)),
      (301L, "2024-01-01 12:00:00", vec(11L)))
    q.processAllAvailable()
    addFile((303L, "2024-01-01 13:30:00",
      Array.tabulate(64)(j => if (j == 2) 1f else 0f))) // sentinel
    q.processAllAvailable(); q.stop()
    val got = hits.toArray.toSeq.asInstanceOf[Seq[(Long, Double)]].sorted
    // 100 exactly once (checkpoint resumed — the phase-1 files were
    // not replayed), 300 via gen-2, 301 via gen-1 through the union
    assert(got == Seq((100L, 1.0), (300L, 1.0), (301L, 1.0)),
      s"rotation cycle diverged: $got")
  }
}
