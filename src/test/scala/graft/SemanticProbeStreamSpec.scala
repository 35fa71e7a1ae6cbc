package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming face of SemDeDup: arriving vectors cell-assign map-side
  * against the session-trained IVF centroids and probe only their
  * cell's members. Pinned doc-for-doc equal to the SAME dataflow run
  * in batch mode (identical expressions — the established twin
  * pattern), with a planted duplicate flagged at cos 1.0 and the
  * streamed rows' ids excluded from matching themselves. */
class SemanticProbeStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("semantic probe stream == batch twin; planted dup flagged at 1.0") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    // probes: an exact re-arrival of corpus vec 5 (cos 1.0 planted), a
    // scaled copy of vec 7 (cosine-invariant ⇒ also a dup), and vec 3
    // re-tagged with a fresh id (whatever its cell holds, stream must
    // agree with batch)
    val corpus = Tables(spark, sf).embeddings
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    val probes = Seq(
      (9005L, t0, corpus(5L)),
      (9007L, t0, corpus(7L).map(x => x * 3.0f)),
      (9003L, t0, corpus(3L)))
    val probeDf = probes.toDF("vec_id", "ts", "embedding")
    // batch twin: the same code path on a non-streaming frame
    val expected = graft.streaming.EventStreams
      .semanticProbeStream(probeDf, spark, sf, threshold = 0.35)
      .select($"vec_id", $"max_cos", $"n_matches")
      .as[(Long, Double, Long)].collect().toSet
    assert(expected.exists { case (id, c, _) => id == 9005L && c == 1.0 },
      s"planted duplicate not flagged in batch twin: $expected")
    assert(expected.exists { case (id, c, _) => id == 9007L && c == 1.0 },
      "scaled copy not flagged (cosine must be scale-invariant)")
    val in = MemoryStream[(Long, Timestamp, Array[Float])]
    in.addData(probes: _*)
    val q = graft.streaming.EventStreams.semanticProbeStream(
        in.toDF().toDF("vec_id", "ts", "embedding"), spark, sf,
        threshold = 0.35)
      .writeStream.outputMode("append").format("memory")
      .queryName("semantic_probe_out").start()
    q.processAllAvailable()
    // watermark pusher finalizes the t0 groups
    in.addData((9999L, Timestamp.valueOf("2024-01-01 11:30:00"),
      Array.fill(64)(0.0f)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("semantic_probe_out")
      .select($"vec_id", $"max_cos", $"n_matches")
      .as[(Long, Double, Long)].collect().toSet
    assert(got == expected,
      s"stream diverged from batch twin:\n got=$got\n want=$expected")
  }
}
