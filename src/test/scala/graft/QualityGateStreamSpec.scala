package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-time Gopher quality gate: junk never passes the stream head,
  * and the gate's verdicts are doc-for-doc identical to the batch
  * `d_gopher_rules` keep flag on the real corpus. */
class QualityGateStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.TextAnalysis

  test("stream gate passes good docs and drops junk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val good = ("the quick brown fox jumps over a lazy dog and " * 8).trim
    val in = MemoryStream[(Long, Timestamp, String)]
    in.addData(
      (1L, t0, good),                       // 50+ words, stopwords, sane lens
      (2L, t0, "short junk"),               // too few words
      (3L, t0, ("x " * 80).trim),           // mean word length too small
      (4L, t0, (1 to 80).map(i => s"zx$i").mkString(" "))) // no stopwords
    val q = graft.streaming.EventStreams.qualityGateStream(
        in.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("quality_gate_out").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("quality_gate_out")
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L), s"got $kept")
  }

  test("gate verdicts equal the batch d_gopher_rules keep flag") {
    import spark.implicits._
    val batch = TextAnalysis.gopherRules(spark, sf)
      .select($"doc_id", $"keep").as[(Long, Int)].collect().toMap
    val gate = Tables(spark, sf).documents
      .select($"doc_id",
        TextAnalysis.gopherKeep(col("text")).cast("int").as("k"))
      .as[(Long, Int)].collect().toMap
    assert(gate == batch)
    assert(gate.values.toSet == Set(0, 1), "degenerate corpus: one class")
  }
}
