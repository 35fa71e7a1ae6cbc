package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed counts aggregate by event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(1), 100, "click", 1.0),
      Event(2, ts(2), 100, "click", 2.0),
      Event(3, ts(11), 101, "view", 5.0))
    val q = EventStreams.windowedCounts(in.toDF(), window = "10 minutes",
      watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("win_out").start()
    q.processAllAvailable()
    // watermark pusher: an hour later, closes all earlier windows
    in.addData(Event(4, Timestamp.valueOf("2024-01-01 11:30:00"), 102, "view", 0.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("win_out")
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(out.contains((ts(0), "click", 2L, 3.0)))
    assert(out.contains((ts(10), "view", 1L, 5.0)))
  }

  test("windowed quantiles: streaming sketch equals the batch percentiles") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val evs = (1 to 40).map(i =>
      Event(i.toLong, ts(i % 10), 100L + i, "click", i.toDouble))
    in.addData(evs: _*)
    val q = EventStreams.windowedQuantiles(in.toDF(), window = "10 minutes",
      watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("quant_out").start()
    q.processAllAvailable()
    in.addData(Event(99, Timestamp.valueOf("2024-01-01 11:30:00"), 1, "view", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("quant_out")
      .filter($"event_type" === "click")
      .select($"p50", $"p95", $"p99", $"n_events")
      .as[(Double, Double, Double, Long)].collect()
    assert(got.length == 1)
    val (p50, p95, p99, n) = got.head
    // same sketch, batch-evaluated, must agree exactly (deterministic
    // GK summary for identical input) — and n pins completeness
    val want = spark.createDataset(evs).toDF()
      .selectExpr("approx_percentile(value, array(0.5, 0.95, 0.99), 1000) q")
      .select($"q" (0), $"q" (1), $"q" (2))
      .as[(Double, Double, Double)].head()
    assert(n == 40L)
    assert((p50, p95, p99) == want)
    assert(p50 <= p95 && p95 <= p99)
  }

  test("observe(): ingest metrics ride the query, no second source pass") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(1), 100, "click", 2.0),
      Event(2, ts(2), 101, "view", 3.5),
      Event(3, ts(3), 102, "click", 4.5))
    val q = EventStreams.observedIngest(in.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("obs_out").start()
    q.processAllAvailable()
    val metrics = q.lastProgress.observedMetrics.get("ingest")
    q.stop()
    assert(metrics != null, "observed metrics missing from progress")
    assert(metrics.getAs[Long]("rows") == 3L)
    assert(metrics.getAs[Long]("null_values") == 0L)
    assert(math.abs(metrics.getAs[Double]("value_sum") - 10.0) < 1e-9)
    assert(metrics.getAs[Timestamp]("max_ts") == ts(3))
    // the sink saw every row exactly once — observe is pass-through
    assert(spark.table("obs_out").count() == 3L)
  }

  test("stream-static enrichment joins the broadcast dim and aggregates per segment") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(1), 100, "click", 1.0),
      Event(2, ts(2), 101, "click", 2.0),
      Event(3, ts(3), 102, "view", 4.0)) // user 102 absent from the dim
    val dim = Seq((100L, "gold"), (101L, "basic")).toDF("user_id", "segment")
    val q = EventStreams.enrichedWindowedValue(in.toDF(), dim,
      window = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    q.processAllAvailable()
    in.addData(Event(4, Timestamp.valueOf("2024-01-01 11:30:00"), 100, "view", 0.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("enrich_out")
      .select($"window_start", $"segment", $"n_events", $"sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(out.contains((ts(0), "gold", 1L, 1.0)))
    assert(out.contains((ts(0), "basic", 1L, 2.0)))
    // inner join: the unmatched user contributes no row
    assert(!out.exists(_._2 == "view"))
  }

  test("native session_window merges events within the gap and splits on silence") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // user 100: events at 10:01 and 10:10 (one session, gap < 15 min),
    // then 10:40 (a second session after 30 min of silence)
    in.addData(
      Event(1, ts(1), 100, "click", 1.0),
      Event(2, ts(10), 100, "click", 2.0),
      Event(3, ts(40), 100, "view", 4.0))
    val q = EventStreams.sessionWindowAgg(in.toDF(), gap = "15 minutes",
      watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sw_out").start()
    q.processAllAvailable()
    in.addData(Event(4, Timestamp.valueOf("2024-01-01 12:30:00"), 102, "view", 0.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("sw_out")
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"sum_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    // session 1: [10:01, 10:10+15min), both events merged
    assert(out.contains((100L, ts(1), ts(25), 2L, 3.0)))
    // session 2: the lone 10:40 event, closed at 10:55
    assert(out.contains((100L, ts(40), ts(55), 1L, 4.0)))
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(1), 100, "click", 1.0),
      Event(1, ts(2), 100, "click", 1.0), // dup id within watermark
      Event(2, ts(3), 100, "view", 2.0))
    val q = EventStreams.dedupStream(in.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_out").select($"event_id")
      .as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L), s"got $ids")
  }

  test("pii scrub composes with a stream: row-local projection, append mode") {
    // the redaction pass is a stateless projection, so the SAME operator
    // runs unchanged over readStream (no watermark, no state store)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData(
      (1L, "contact a@b.com or 10.0.0.1"),
      (2L, "clean text only"))
    val q = graft.operators.TextAnalysis
      .piiScrubOf(in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("pii_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("pii_out")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1, 1, 0, "contact <EMAIL> or <IP>"),
      (2L, 0, 0, 0, "clean text only")), s"got $got")
  }

  test("parquet file-source stream matches the batch windowed counts") {
    // the real source plumbing: the events table (normalized by
    // Tables.normalizeEventsTs, whatever the parquet generation) consumed
    // via readStream must produce exactly the batch q_events_hourly
    // aggregates once the watermark closes the windows
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("evstream").toFile
    dir.deleteOnExit()
    val events = Tables(spark, sf).events
    events.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(events.schema)
      .parquet(dir.getAbsolutePath)
    val q = EventStreams.windowedCounts(stream, window = "1 hour",
      watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("file_win_out").start()
    q.processAllAvailable()
    // watermark pusher: one far-future event in a second file closes
    // every real window (anchored to the true max ts — the table spans
    // days, so an arbitrary row + offset could land short of it)
    val maxTs = events.agg(max($"ts")).head().getTimestamp(0)
    events.limit(1)
      .withColumn("ts",
        lit(new java.sql.Timestamp(maxTs.getTime + 2L * 86400000L)))
      .write.mode("append").parquet(dir.getAbsolutePath)
    q.processAllAvailable(); q.stop()
    val got = spark.table("file_win_out")
      .groupBy().agg(sum($"n_events")).head().getLong(0)
    val want = Tables(spark, sf).events.count()
    assert(got == want, s"streamed window counts $got != batch events $want")
  }

  test("streaming near-dup filter drops same-signature docs within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    in.addData(
      (1L, ts(1), "alpha beta gamma delta"),
      (2L, ts(2), "alpha beta gamma delta"),       // identical token set → same sig
      (3L, ts(3), "delta gamma beta alpha alpha"), // same SET (minhash is set-based)
      (4L, ts(4), "totally different words here"))
    val q = EventStreams.nearDupFilterStream(
        in.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_out").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("neardup_out").select($"doc_id")
      .as[Long].collect().toSeq.sorted
    assert(ids == Seq(1L, 4L), s"got $ids")
  }

  test("stream-stream interval join attributes clicks to prior views") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    views.addData(
      Event(10, ts(1), 100, "view", 0.0),  // matches click at 10:05
      Event(11, ts(2), 101, "view", 0.0),  // user never clicks
      Event(12, ts(50), 100, "view", 0.0)) // AFTER the click: no match
    clicks.addData(
      Event(20, ts(5), 100, "click", 7.0),
      Event(21, ts(40), 102, "click", 1.0)) // user with no view
    val q = EventStreams.clickAttribution(views.toDF(), clicks.toDF(),
      horizon = "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_out").start()
    q.processAllAvailable()
    // push both watermarks forward so buffered state flushes
    views.addData(Event(98, Timestamp.valueOf("2024-01-01 12:00:00"), 999, "view", 0.0))
    clicks.addData(Event(99, Timestamp.valueOf("2024-01-01 12:00:00"), 999, "click", 0.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("attr_out")
      .filter($"user_id" =!= 999) // drop the watermark-pusher pair
      .select($"user_id", $"click_id", $"view_id", $"value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((100L, 20L, 10L, 7.0)), s"got $out")
  }

  test("stream-stream LEFT OUTER join emits unattributed clicks as nulls after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    views.addData(
      Event(10, ts(1), 100, "view", 0.0))   // matches click 20
    clicks.addData(
      Event(20, ts(5), 100, "click", 7.0),  // attributed
      Event(21, ts(6), 102, "click", 1.0))  // user with NO view ever
    val q = EventStreams.clickAttributionOuter(views.toDF(), clicks.toDF(),
      horizon = "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_outer").start()
    q.processAllAvailable()
    // advance BOTH watermarks far past click 21 + horizon so the outer
    // side gives up waiting and emits the null row
    views.addData(Event(98, Timestamp.valueOf("2024-01-01 12:00:00"), 999, "view", 0.0))
    clicks.addData(Event(99, Timestamp.valueOf("2024-01-01 12:00:00"), 999, "click", 0.0))
    q.processAllAvailable()
    views.addData(Event(96, Timestamp.valueOf("2024-01-01 14:00:00"), 999, "view", 0.0))
    clicks.addData(Event(97, Timestamp.valueOf("2024-01-01 14:00:00"), 999, "click", 0.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("attr_outer")
      .filter($"user_id" =!= 999)
      .select($"user_id", $"click_id", $"view_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(out.contains((100L, 20L, Some(10L))), s"got $out")
    assert(out.contains((102L, 21L, None)), s"unmatched click not emitted: $out")
    assert(out.size == 2, s"got $out")
  }

  test("streaming Misra-Gries heavy hitters: whole-stream soundness bound") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val hh = new graft.streaming.StreamingHeavyHitters(counters = 8)
    val q = in.toDF().writeStream
      .outputMode("append")
      .foreachBatch(hh.update _)
      .start()
    // skewed stream: item 7 dominates, long tail of 50 singletons,
    // split across THREE micro-batches so the merge path is exercised
    val exact = scala.collection.mutable.HashMap.empty[Long, Long]
      .withDefaultValue(0L)
    def push(xs: Seq[Long]): Unit = {
      xs.foreach(x => exact(x) += 1L)
      in.addData(xs)
      q.processAllAvailable()
    }
    push((1L to 40L).map(_ => 7L) ++ (100L to 120L))
    push((1L to 25L).map(_ => 7L) ++ (121L to 140L) ++ Seq(9L, 9L, 9L))
    push((141L to 150L) ++ Seq(9L, 9L, 7L))
    q.stop()
    val (est, dec) = hh.result
    // soundness for EVERY item: est <= exact <= est + dec
    exact.foreach { case (x, c) =>
      val e = est.getOrElse(x, 0L)
      assert(e <= c && c <= e + dec, s"item $x: est=$e exact=$c dec=$dec")
    }
    est.foreach { case (x, e) => assert(e <= exact(x)) }
    // the dominant item survives with the highest estimate
    assert(est.nonEmpty && est.maxBy(_._2)._1 == 7L)
  }

  test("sessionize closes sessions on gap and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // user 100: events at 10:01 and 10:05 (one session), then 10:40
    // (new session after >10min gap)
    in.addData(
      Event(1, ts(1), 100, "click", 1.0),
      Event(2, ts(5), 100, "click", 2.0),
      Event(3, ts(40), 100, "click", 4.0))
    val q = EventStreams.sessionize(in.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    q.processAllAvailable()
    // push the watermark far past 10:40+gap so both sessions time out
    in.addData(Event(4, Timestamp.valueOf("2024-01-01 13:00:00"), 999, "view", 0.0))
    q.processAllAvailable()
    in.addData(Event(5, Timestamp.valueOf("2024-01-01 14:00:00"), 999, "view", 0.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess_out")
      .select($"user_id", $"session_start", $"n_events", $"sum_value")
      .as[(Long, Timestamp, Long, Double)].collect().toSet
    assert(out.contains((100L, ts(1), 2L, 3.0)), s"got $out")
    assert(out.contains((100L, ts(40), 1L, 4.0)), s"got $out")
  }

  test("streaming degree maintenance updates counts incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    in.addData((1L, 2L), (2L, 3L))
    val q = EventStreams.degreeStream(in.toDF().toDF("src", "dst"))
      .writeStream.outputMode("update").format("memory")
      .queryName("deg_out").start()
    q.processAllAvailable()
    // batch 2: a new edge touching 1 and 3 — only changed vertices emit
    in.addData((1L, 3L))
    q.processAllAvailable(); q.stop()
    // latest emitted degree per vertex == batch degrees of the union
    val latest = spark.table("deg_out")
      .groupBy($"id").agg(org.apache.spark.sql.functions.max($"degree")
        .as("degree"))
      .as[(Long, Long)].collect().toMap
    assert(latest == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $latest")
  }

  test("windowed approx-distinct users: HLL per window within tolerance") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // 40 distinct users in one window, repeats included
    in.addData((1 to 80).map(i =>
      Event(i.toLong, ts(1), (i % 40).toLong, "click", 1.0)): _*)
    val q = EventStreams.windowedApproxUsers(in.toDF(),
      window = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("hll_out").start()
    q.processAllAvailable()
    in.addData(Event(999, Timestamp.valueOf("2024-01-01 11:30:00"),
      1, "view", 0.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("hll_out")
      .select($"window_start", $"event_type", $"approx_users", $"n_events")
      .as[(Timestamp, String, Long, Long)].collect()
    val click = out.find(_._2 == "click").get
    assert(click._1 == ts(0))
    assert(click._4 == 80L)
    // rsd=0.02 → 40 ± a few
    assert(math.abs(click._3 - 40L) <= 3, s"approx ${click._3}")
  }

  test("idempotent parquet sink: batch replay overwrites, never appends") {
    import graft.streaming.Sinks
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.writeBatch(b0, dir, batchId = 0L)
    Sinks.writeBatch(Seq((3L, "c")).toDF("id", "v"), dir, batchId = 1L)
    // failure replay: batch 1 re-delivered with different row order
    Sinks.writeBatch(Seq((3L, "c")).toDF("id", "v").repartition(3),
      dir, batchId = 1L)
    val out = spark.read.parquet(dir)
      .select($"id", $"v", $"batch_id").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L)))
    // dynamic overwrite is per-partition: replaying batch 1 left batch 0
    assert(out.count(_._3 == 0L) == 2)
    // the streaming attach path wires foreachBatch end-to-end
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(Event(10, ts(1), 7, "click", 1.0))
    val dir2 = java.nio.file.Files.createTempDirectory("graft-sink2").toString
    val q = Sinks.startIdempotentParquet(
      in.toDF().select($"event_id", $"event_type"), dir2)
    q.processAllAvailable(); q.stop()
    val streamed = spark.read.parquet(dir2)
      .select($"event_id", $"event_type", $"batch_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(streamed == Seq((10L, "click", 0L)))
  }

  test("streaming decayed counter equals the batch formula, late-safe") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val hl = 10 * 60 * 1000L // 10-minute half-life for a visible decay
    // batch 1 in order; batch 2 includes a LATE event (ts before the
    // state clock) — the fold must pre-decay it, not rewind
    val evs = Seq(
      Event(1, ts(0), 1, "click", 8.0),
      Event(2, ts(10), 1, "click", 4.0), // one half-life after ev 1
      Event(3, ts(20), 1, "click", 2.0),
      Event(4, ts(5), 1, "click", 16.0)) // late
    in.addData(evs(0), evs(1))
    val q = EventStreams.decayedCounter(in.toDS(), halfLifeMs = hl)
      .writeStream.outputMode("update").format("memory")
      .queryName("decay_out").start()
    q.processAllAvailable()
    in.addData(evs(2), evs(3))
    q.processAllAvailable(); q.stop()
    val last = spark.table("decay_out")
      .orderBy($"last_ms".desc).limit(1)
      .as[(String, Long, Double)].collect().head
    val maxMs = evs.map(_.ts.getTime).max
    val want = evs.map(e =>
      e.value * math.pow(2.0, -(maxMs - e.ts.getTime).toDouble / hl)).sum
    assert(last._1 == "click" && last._2 == maxMs)
    assert(math.abs(last._3 - want) < 1e-9,
      s"streamed ${last._3} vs batch $want")
  }

  test("streaming chunking emits the batch chunk rows (stateless, append)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, (1 to 80).map(i => s"w$i").mkString(" ")),
      (2L, "alpha beta gamma"))
    val in = MemoryStream[(Long, String)]
    in.addData(docs: _*)
    val q = EventStreams.chunkStream(in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("chunk_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("chunk_out")
      .as[(Long, Int, Int, Int, String)].collect().toSet
    val want = graft.operators.Curation
      .docChunks(docs.toDF("doc_id", "text"), 32, 24)
      .as[(Long, Int, Int, Int, String)].collect().toSet
    assert(got == want, s"stream $got vs batch $want")
    assert(got.count(_._1 == 1L) == 4) // ceil(80/24)
  }

  test("windowed KMV distinct: streaming bottom-k equals the batch sketch per window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // 30 users in the 10:00 window (ids interleaved so hashes spread),
    // repeated events per user — the dedup stage must collapse them
    val evs = (1 to 60).map(i =>
      Event(i.toLong, ts(i % 10), 100L + (i % 30), "click", 1.0))
    in.addData(evs: _*)
    val q = EventStreams.windowedKmvUsers(in.toDF(),
      window = "10 minutes", watermark = "5 minutes", k = 8)
      .writeStream.outputMode("append").format("memory")
      .queryName("kmv_out").start()
    q.processAllAvailable()
    in.addData(Event(999, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "view", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("kmv_out")
      .filter($"event_type" === "click")
      .as[(Timestamp, String, Long, Long)].collect()
    assert(got.length == 1, s"got ${got.toSeq}")
    val (_, _, hk, est) = got.head
    // batch replay of the identical sketch on the same 30 users
    import org.apache.spark.sql.functions._
    val hashes = spark.createDataset(evs).toDF()
      .select(conv(substring(md5(concat(lit("kmv:"), col("user_id"))),
        1, 15), 16, 10).cast("long").as("h"))
      .distinct().orderBy("h").limit(8)
      .as[Long].collect()
    assert(hashes.length == 8)
    val wantHk = hashes.max
    val wantEst = math.round(7.0 * math.pow(2, 60) / wantHk.toDouble)
    assert(hk == wantHk, s"kth hash $hk vs $wantHk")
    assert(est == wantEst, s"est $est vs $wantEst")
    // 30 true distinct users: a k=8 sketch should land the right decade
    assert(est > 5 && est < 300, s"est $est implausible for 30 users")
  }
}
