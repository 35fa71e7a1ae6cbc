package graft

object Bench {
  /** (stealJiffies, totalJiffies) from /proc/stat's aggregate cpu line.
    * The bench host is bimodally throttled (README: identical code 484
    * vs 689 s two hours apart; round 7 recorded 162.5 s for a query
    * that probes at 15.3 s quiet) — sampling steal around the run and
    * around each query makes a throttled sample SELF-IDENTIFYING
    * instead of reading as a code regression. */
  private def cpuSample(): (Long, Long) =
    try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val f = l.trim.split("\\s+").drop(1).map(_.toLong)
      (if (f.length > 7) f(7) else 0L, f.sum)
    } catch { case _: Throwable => (0L, 0L) }

  private def stealPct(before: (Long, Long), after: (Long, Long)): Double = {
    val dTot = after._2 - before._2
    if (dTot <= 0) 0.0
    else math.round(10000.0 * (after._1 - before._1) / dTot) / 100.0
  }

  /** Host-mode self-calibration (r10, VERDICT r9 "Next #7"): the bench
    * host is BIMODAL at identical steal (r9: six runs of one binary at
    * ≤0.3% steal clustered at ~315 s or ~360-373 s, every line
    * inflated ~15% together), so cross-round totals were ambiguous.
    * This probe times a fixed single-thread integer loop (pure
    * CPU-bound, JIT-warmed, median of 5) whose duration depends only
    * on the host's current per-core speed — recorded as `calib_ms`
    * with a derived `host_mode`, so round-over-round comparisons can
    * be made within-mode by construction. */
  private def calibrate(): Double = {
    def loop(iters: Long): Long = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0L
      while (i < iters) {
        x = x * 6364136223846793005L + 1442695040888963407L
        x ^= (x >>> 33)
        i += 1
      }
      x
    }
    require(loop(20000000L) != 0L) // JIT warmup; value is never zero
    val samples = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      require(loop(50000000L) != 0L)
      (System.nanoTime() - t0) / 1e6
    }
    math.round(samples.sorted.apply(2) * 100.0) / 100.0
  }

  /** Fast-mode cutoff for `host_mode`, in ms. Both modes sampled in
    * r10: slow runs measured 113-132 ms (suite totals 371-403 s), a
    * fast run measured 99.09 ms (345 s) — the predicted ~99 ms fast
    * mode landed exactly, and the cutoff splits the observed clusters
    * cleanly. `calib_ms` is always recorded raw, so a mislabeled mode
    * stays recoverable if a new cluster appears. */
  private val FastCutoffMs = 107.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // the shared session factory: same AQE/Kryo/UTC config the library
    // documents, so the benchmark measures the intended configuration
    val spark = GraftSession.get("graft-bench", cpus)
    // host-mode probe FIRST, before any Spark work competes for cores
    val calibMs = calibrate()
    val hostMode = if (calibMs <= FastCutoffMs) "fast" else "slow"
    // absorb session/JIT/codegen startup so it is not attributed to the
    // alphabetically-first query (no data is touched or cached here)
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    // Attribute the memoized shared caches EXPLICITLY: several query
    // lines are thin readers over expensive session caches, and without
    // attribution the alphabetically-first consumer absorbs the whole
    // build (g_adamic_adar read as 20 s in round 6 when ~2/3 was the
    // shared triangle-stream build). The builds run here, timed per
    // cache, and still count toward `value` — they are real work the
    // suite pays exactly once.
    val sharedBuilds: Seq[(String, () => Unit)] = {
      import graft.graph.{GraphBuilder, GraphQueries}
      import graft.operators.Dedup
      def g = GraphBuilder.coPurchase(spark, sfDir)
      def docs = Tables(spark, sfDir).documents
      Seq(
        "co_purchase_graph" -> (() => { g.degrees.count(); () }),
        "directed_edges" -> (() =>
          { graft.graph.Scc.lineSequenceEdges(spark, sfDir).count(); () }),
        // force the SCC labels build HERE so (a) the g_scc query line
        // reads as the thin memo consumer it is and (b) the run's
        // trim/color/settle phase split lands in `scc_phases` (r8's
        // 13.8 s top line was unattributed variance folklore)
        "scc_labels" -> (() =>
          { graft.graph.Scc.labels(spark, sfDir).count(); () }),
        "edge_common_stats" -> (() => { g.edgeCommonStats.count(); () }),
        // the two 1-row kernel memos behind g_square_count / g_clique4
        // AND the graphlet census — without attribution the
        // alphabetically-first consumer (g_clique4, then
        // g_graphlet_census) absorbs each build
        "square_count_kernel" -> (() => { g.squareCount.count(); () }),
        "clique4_kernel" -> (() => { g.clique4Count.count(); () }),
        // r9: ONE Brandes sweep now serves both betweenness rankings —
        // attribute it so neither query line absorbs the shared run
        "brandes_sweep" -> (() =>
          { graft.graph.GxBetweenness.run(g, 8).count(); () }),
        "lpa_communities" -> (() => { GraphBuilder.communities(spark, g).count(); () }),
        "community_sample" -> (() =>
          { graft.graph.CommunitySample.sample(spark, g).count(); () }),
        "louvain_phase1" -> (() => { GraphQueries.louvainPhase1(spark, sfDir).count(); () }),
        "louvain_two_level" -> (() => { GraphQueries.louvain2(spark, sfDir).count(); () }),
        "lsh_pairs" -> (() => { Dedup.cachedMinhashPairs(sfDir, docs, 0.8).count(); () }),
        "lsh_components" -> (() => { Dedup.nearDupComponents(spark, docs, sfDir, 0.8).count(); () }),
        // the persisted band-index WRITE is a once-per-session artifact
        // build (r9) — attribute it here so d_incremental_dedup reads
        // as the thin delta-vs-loaded-index probe it is
        "band_index" -> (() =>
          { Dedup.incrementalDedup(spark, sfDir).limit(1).count(); () }),
        // r10: the default-cap sweep's GATED distributed-CC rollup —
        // sf0.1 carries one 3.5k-member template component (memberCap
        // 707), so the gate fires even at the 250k default and its
        // one-time memoized build (r10) otherwise lands unattributed
        // on the d_threshold_sweep query line (read 17 s there)
        "sweep_gated_cc" -> (() =>
          { Dedup.dedupThresholdSweep(spark, sfDir).limit(1).count(); () }),
        // ANN index trainings are session memos too (r8): without
        // attribution the alphabetically-first consumer (e_knn_pq /
        // e_knn_sq / e_bq_codes) absorbs the whole build
        "pq_index" -> (() =>
          { graft.operators.Ann.knnPq(spark, sfDir).count(); () }),
        "ivfpq_index" -> (() =>
          { graft.operators.Ann.knnIvfPq(spark, sfDir).count(); () }),
        "sq_table" -> (() =>
          { graft.operators.Ann.sqDecoded(spark, sfDir).count(); () }),
        "bq_codes" -> (() =>
          { graft.operators.Ann.bqCodes(spark, sfDir).count(); () }),
        // r10: the OPQ rotation training + rotated-corpus PQ index —
        // attributed so e_opq_recall reads as the thin recall join
        "opq_index" -> (() =>
          { graft.operators.Ann.knnOpq(spark, sfDir).count(); () }),
        // r11: the persisted vector-index WRITE (train + model + gen-1
        // members parquet) is a once-per-session artifact build — the
        // band_index precedent; without it e_incremental_semdedup
        // absorbs the whole training+write
        "vector_index" -> (() =>
          { graft.operators.AnnIndex.incrementalSemDedup(spark, sfDir)
            .limit(1).count(); () }),
        // r12: ONE aHash pass now serves m_avg_hash AND m_media_neardup
        // (each used to hash every payload itself) — attribute the
        // shared hash-table memo so the alphabetically-first consumer
        // does not absorb the payload scan
        "media_ahash" -> (() =>
          { graft.operators.Multimodal.ahashTable(spark, sfDir).count(); () }),
        // r12: ONE first-arrival-month pair table now serves
        // g_edge_arrival AND g_densification (each used to build the
        // same pair-scale table itself) — attributed for the same reason
        "first_seen_edges" -> (() =>
          { GraphQueries.coPurchaseFirstSeen(spark, sfDir).count(); () })
      )
    }
    val builds = sharedBuilds.map { case (name, f) =>
      val t0 = System.nanoTime()
      val err = try { f(); None } catch { case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // deterministic order (not Map hash order) so per-query timings are
    // comparable across rounds
    val runStart = cpuSample()
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = ordered.map { case (name, fn) =>
      val cpu0 = cpuSample()
      val t0 = System.nanoTime()
      // noop sink: forces FULL evaluation of every column. A bare
      // count() lets Catalyst prune entire join branches (measured 30×
      // fake-fast on the triangle queries), which would overstate perf.
      // A failure is RECORDED, never swallowed: a crash that shows up
      // as a sub-0.1 s "success" hides regressions (it did in round 5).
      val err = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
      }
      (name, (System.nanoTime() - t0) / 1e9, err, stealPct(cpu0, cpuSample()))
    }
    val runSteal = stealPct(runStart, cpuSample())
    // FALLBACK PROBES (r9): the >500k-vertex branches — the plans a
    // 100 TB graph actually runs — executed end-to-end on a REAL
    // 600k-vertex synthetic graph (ring + two multiplicative-hash
    // chord families; deterministic, no RNG). sf0.1's ~20k vertices
    // always broadcast, so without these lines the wide wedge-stream
    // square count, the shuffle-join clique4 and the no-broadcast
    // triangle estimate had never run outside toy specs.
    val fallbackProbes: Seq[(String, Double, Option[String])] = try {
      import graft.graph.{Graph, GraphBuilder, GraphQueries}
      val n = 600000L
      val ring = spark.range(n)
        .selectExpr("id AS src", s"(id + 1) % $n AS dst")
      val chords1 = spark.range(n)
        .selectExpr("id AS src", s"(id * 2654435761) % $n AS dst")
      val chords2 = spark.range(n)
        .selectExpr("id AS src", s"(id * 40503 + 12345) % $n AS dst")
      val rawEdges = ring.union(chords1).union(chords2)
        .selectExpr("least(src, dst) AS src", "greatest(src, dst) AS dst")
        .filter("src <> dst").distinct()
      // r11 (VERDICT r10 "Next #8"): the synthetic 1.8M-row edge build
      // + distinct used to land inside the FIRST probe's line
      // (confounding fb_square_count_wide — the one r10 "regression",
      // which re-measures within noise once attributed). The build now
      // WRITES the edge set to parquet, timed as its own line, and the
      // probes scan that file — stable plan leaf with real statistics.
      // Both cache variants were tried and REVERTED on measurement: a
      // raw .persist() InMemoryRelation read ~2× slower than
      // recomputing per probe (ProbeFbTriangle: 8.5 s vs 4.1 warm),
      // and a Materialize.table flat leaf — fastest in a fresh session
      // (2.3 s) — degraded to 110 s at the END of the bench session,
      // where ~20 memoized tables already hold the storage memory and
      // evicted probe-graph blocks recompute per partition.
      var g: Graph = null
      Seq[(String, () => Unit)](
        "fb_graph_build" -> (() => {
          val tmp = java.nio.file.Files
            .createTempDirectory("graft-bench-probe-graph").toString
          rawEdges.write.mode("overwrite").parquet(tmp)
          g = Graph(spark.range(n).toDF("id"), spark.read.parquet(tmp))
          // the probes are only probes if the graph clears the gate
          require(g.vertexCount > Graph.broadcastVertexGate,
            s"probe graph (${g.vertexCount}) must exceed the broadcast gate")
        }),
        "fb_square_count_wide" ->
          (() => { g.squareCountPlan.head(); () }),
        "fb_clique4_shuffle" ->
          (() => { g.clique4Plan.head(); () }),
        "fb_triangle_estimate_nobroadcast" ->
          (() => { GraphQueries.triangleEstimateOn(g, 4, 42L).head(); () }),
        // the r9 threshold-sweep gate's DISTRIBUTED branch on the real
        // sf corpus: cap forced low so actual giant components route
        // through Gx.maskedPairCc (rides the session pair cache)
        "fb_threshold_sweep_gated" ->
          (() => { graft.operators.Dedup
            .dedupThresholdSweep(spark, sfDir, bigComponentPairCap = 1000)
            .head(); () })
      ).map { case (name, f) =>
        val t0 = System.nanoTime()
        val err = try { f(); None } catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
        }
        (name, (System.nanoTime() - t0) / 1e9, err)
      } // no unpersist: spark.stop() follows immediately
    } catch { case e: Throwable =>
      // a probe-graph build failure must never cost the whole bench
      // artifact — record it as one failed probe line instead
      Seq(("fb_probe_setup", 0.0,
        Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")))
    }
    // truncate BEFORE escaping (truncating after could cut an escape
    // sequence in half) and blank ALL control chars, not just \r\n\t
    def jstr(s: String): String =
      "\"" + s.take(300).replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1F]", " ") + "\""
    // `queries` stays numbers-only (the driver's contract); failures go
    // to a separate `errors` map and are EXCLUDED from queries/total
    val qs = results.collect { case (k, v, None, _) =>
      s"\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    // queries that ran under meaningful CPU steal — their timings are
    // host noise, not code; the driver's 2x gate should discount them
    val stealHot = results.collect { case (k, _, _, s) if s >= 5.0 =>
      s"\"" + k + "\":" + s
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(e), _) => (k, e) } ++
      builds.collect { case (k, _, Some(e)) => (s"build:$k", e) } ++
      fallbackProbes.collect { case (k, _, Some(e)) => (s"probe:$k", e) }
    val errs = failed.map { case (k, e) => s"\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val sb = builds.collect { case (k, v, None) =>
      s"\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val buildTotal = builds.collect { case (_, v, None) => v }.sum
    // `value` = builds + queries: the same wall-clock work the suite
    // always paid, now split so shared-cache cost reads separately
    val total = results.collect { case (_, v, None, _) => v }.sum + buildTotal
    // top-5 slowest query lines, duplicated into the tail summary
    val top5 = results.collect { case (k, v, None, _) => (k, v) }
      .sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // KEY ORDER IS THE ARTIFACT CONTRACT: the driver records only the
    // LAST 2,000 characters of stdout (BENCH_r08 lost its own totals
    // and the whole g_* map that way). The big per-query/build maps go
    // FIRST and every summary field (metric/value/steal/failures/top5)
    // goes LAST, so the truncated tail alone answers "total, failures,
    // steal, top-5 lines".
    val fb = fallbackProbes.collect { case (k, v, None) =>
      s"\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val json =
      s"""{"queries":$qs,"shared_build":$sb,"errors":$errs,""" +
        s""""sf":"$sfDir","shared_build_sec":$buildTotal,""" +
        s""""steal_pct":$runSteal,"steal_hot":$stealHot,""" +
        s""""fallback_probes":$fb,""" +
        s""""scc_phases":${
          graft.graph.Scc.lastPhaseTimings.toSeq.sortBy(_._1)
            .map { case (k, v) => s"\"" + k + "\":" + v }
            .mkString("{", ",", "}")},""" +
        s""""failures":${failed.size},"top5":$top5,""" +
        s""""calib_ms":$calibMs,"host_mode":"$hostMode",""" +
        s""""metric":"total","unit":"sec","value":$total}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    println(json)
    // r12 (VERDICT r11 #2): the driver keeps only the last ~2,000 chars
    // of stdout and json-parses that tail; the full line above (256
    // query entries) outgrew that window in EVERY round 1-11, so each
    // PERF_*.json carried `parsed: null`. A second, SELF-CONTAINED
    // summary line goes last: every summary field of the full line,
    // none of the per-query maps (those stay in the full line above and
    // in bench_out.json, which `full` points at), always < 2,000 chars
    // — so the tail window holds one complete JSON object. ADDITIVE
    // ONLY: the full line, its key order, and bench_out.json are
    // byte-identical to r11's contract.
    val compact =
      s"""{"sf":"$sfDir","shared_build_sec":$buildTotal,""" +
        s""""steal_pct":$runSteal,"failures":${failed.size},""" +
        s""""top5":$top5,"calib_ms":$calibMs,"host_mode":"$hostMode",""" +
        s""""n_queries":${results.size},"full":"$outFile",""" +
        s""""metric":"total","unit":"sec","value":$total}"""
    println(compact)
    if (failed.nonEmpty) {
      System.err.println(s"BENCH FAILURES: ${failed.size}")
      failed.foreach { case (n, e) => System.err.println(s"  $n: $e") }
    }
    // stdout-tail capture can truncate the per-query map (it did in
    // round 4) — persist the full line to a file as well
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
