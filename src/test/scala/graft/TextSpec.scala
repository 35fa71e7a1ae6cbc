package graft

import graft.operators.{Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("token counts on a known sentence") {
    val r = TextAnalysis.tokenCounts(spark, sf)
      .filter($"n_tokens" =!= $"n_bpe_tokens" && $"n_tokens" > 0)
    // word-salad corpus: pure-alpha tokens, so whitespace == BPE counts
    assert(r.count() == 0)
  }

  test("quality scores are within [0,1] and ratios sane") {
    val r = TextAnalysis.qualityScores(spark, sf).cache()
    assert(r.filter($"quality" < 0 || $"quality" > 1).count() == 0)
    assert(r.filter($"alpha_ratio" < 0 || $"alpha_ratio" > 1).count() == 0)
    assert(r.count() > 0)
  }

  test("langId labels the english word-salad as en") {
    val r = TextAnalysis.langId(spark, sf).cache()
    val en = r.filter($"lang_pred" === "en").count()
    assert(en > r.count() / 2, "most docs should score as English")
  }

  test("piiScrub redacts emails, IPs and phones and counts each on crafted docs") {
    val docs = Seq(
      (1L, "mail me at jane.doe+spam@example.co.uk or bob@x.io today"),
      (2L, "server 10.0.255.3 and 192.168.1.1 went down"),
      (3L, "call 555-123-4567 or 555.987.6543 now"),
      (4L, "clean document with no pii at all"),
      (5L, "mixed: a@b.com from 127.0.0.1 dialed 800-555-0199"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.piiScrubOf(docs)
      .as[(Long, Int, Int, Int, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((2, 0, 0,
      "mail me at <EMAIL> or <EMAIL> today")))
    assert(r(2L) == ((0, 2, 0, "server <IP> and <IP> went down")))
    assert(r(3L) == ((0, 0, 2, "call <PHONE> or <PHONE> now")))
    assert(r(4L) == ((0, 0, 0, "clean document with no pii at all")))
    assert(r(5L) == ((1, 1, 1, "mixed: <EMAIL> from <IP> dialed <PHONE>")))
    // the synthetic corpus is PII-free: the operator must be a no-op on it
    val corpus = TextAnalysis.piiScrub(spark, sf).cache()
    assert(corpus.filter($"n_emails" + $"n_ips" + $"n_phones" =!= 0).count() == 0)
    assert(corpus.count() > 0)
    corpus.unpersist()
  }

  test("zipfSlope is negative and matches a hand regression on the top tokens") {
    val Seq((n, slope)) = TextAnalysis.zipfSlope(spark, sf)
      .as[(Long, Double)].collect().toSeq
    assert(n > 10 && n <= 100)
    assert(slope < 0.0, s"token frequencies must decay with rank, got $slope")
    // hand-replay: same micro-unit regression over the same top-k
    val freqs = Tables(spark, sf).documents
      .select(explode(split($"text", "\\s+")).as("token"))
      .filter($"token" =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token".asc).limit(100)
      .as[(String, Long)].collect()
    val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(f.toDouble) * 1e6))
    }
    val k = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val want = BigDecimal((k * sxy - sx * sy).toDouble / (k * sxx - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(slope == want)
  }

  test("qualitySurvivors keeps the best-quality cluster member, not the min id") {
    // near-identical pair where the LOWER id is the WORSE copy: min-id
    // retention would keep the digit-polluted text; quality retention
    // must keep doc 2 (stopword-rich tail → higher blend)
    val base = (1 to 120).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$base 1111 2222 3333"),
      (2L, s"$base the of and in"),
      (10L, "identical exact copy text right here"),
      (11L, "identical exact copy text right here"),
      (99L, "a lonely singleton document with no duplicate"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-surv").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = graft.operators.Dedup.qualitySurvivors(spark, tmp)
      .as[(Long, Long, Double, Long)].collect().toList.sortBy(_._1)
    assert(r.map(x => (x._1, x._2, x._4)) == List((1L, 2L, 2L), (10L, 10L, 2L)),
      s"got $r")
    // identical texts tie on quality -> min id wins deterministically
    assert(r.find(_._1 == 10L).get._2 == 10L)
  }

  test("fingerprints are deterministic and subset-stable") {
    val a = TextAnalysis.fingerprints(spark, sf).collect().toSet
    val b = TextAnalysis.fingerprints(spark, sf).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("minhash candidates contain the truly similar pairs (recall spot-check)") {
    val docs = Tables(spark, sf).documents.limit(120).cache()
    // brute-force true Jaccard >= 0.95 pairs on a small slice
    val sets = docs.select($"doc_id", array_distinct(split($"text", " ")).as("t"))
    val truth = sets.as("x").join(sets.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        (size(array_intersect(col("x.t"), col("y.t"))).cast("double") /
          size(array_union(col("x.t"), col("y.t")))).as("j"))
      .filter($"j" >= 0.95)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val found = Dedup.minhashDupPairs(docs, threshold = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    if (truth.nonEmpty) {
      val recall = (truth intersect found).size.toDouble / truth.size
      assert(recall >= 0.8, s"minhash recall $recall over ${truth.size} pairs")
    }
  }

  test("near-dup clusters merge transitive pair chains with min-id survivor") {
    // A~B and B~C near-identical (C not directly generated from A's
    // text edit distance, only via B) — the cluster must still be one
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, base),
      (11L, base + " extraA"),
      (12L, base + " extraA extraB"),
      (50L, (100 to 160).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(spark, docs,
      cacheKey = "testclusters", threshold = 0.8)
      .as[(Long, Long, Long)].collect()
    assert(clusters.length == 1)
    val (cluster, survivor, n) = clusters.head
    assert(survivor == 10L && n == 3L && cluster == 10L)
  }

  test("simhash near-identical docs have small hamming distance") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(docs).as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
  }

  test("exact-dup pre-pass: a 1000-copy group stays O(groups) in the band join") {
    val k = 1000
    val copies = (1 to k).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
    val others = Seq(
      (5001L, "iota kappa lambda mu nu xi omicron pi"),
      (5002L, "rho sigma tau upsilon phi chi psi omega"))
    val docs = (copies ++ others).toDF("doc_id", "text").cache()
    // rep-level candidates are bounded by distinct TEXTS, not copies:
    // 3 distinct signatures ⇒ ≤ C(3,2) = 3 candidate rows ever reach
    // the verify stage, no matter how large the copy group is
    val sigs = Dedup.minhashSignatures(docs)
    val repSigs = sigs.groupBy("sig").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "sig")
    val candCount = Dedup.repBandCandidates(repSigs, bands = 8,
      rowsPerBand = 16).count()
    assert(candCount <= 3, s"rep candidates $candCount should be O(groups)")
    // ...while the expanded OUTPUT still contains every within-group
    // pair at est_jaccard exactly 1.0
    val pairs = Dedup.minhashDupPairs(docs, threshold = 0.9).cache()
    val within = pairs.filter($"a" <= k && $"b" <= k)
    assert(within.count() == k.toLong * (k - 1) / 2)
    assert(within.filter($"est_jaccard" =!= 1.0).count() == 0)
    // simhash path: same corpus, within pairs at hamming 0
    val sh = Dedup.simhashDupPairs(docs, maxHamming = 3)
      .filter($"a" <= k && $"b" <= k)
    assert(sh.count() == k.toLong * (k - 1) / 2)
    assert(sh.filter($"hamming" =!= 0).count() == 0)
    docs.unpersist(); pairs.unpersist()
  }

  test("pre-pass pipeline matches naive per-doc banding bit-for-bit") {
    val docs = Tables(spark, sf).documents.select("doc_id", "text").limit(150)
      .union(Seq((900001L, "alpha beta gamma delta"),
                 (900002L, "alpha beta gamma delta")).toDF("doc_id", "text"))
      .cache()
    // naive reference: band EVERY doc (the pre-refactor pipeline)
    val sigs = Dedup.minhashSignatures(docs)
    val naive = Dedup.repBandCandidates(sigs, bands = 8, rowsPerBand = 16)
      .join(sigs.select($"doc_id".as("a"), $"sig".as("sig_a")), "a")
      .join(sigs.select($"doc_id".as("b"), $"sig".as("sig_b")), "b")
      .select($"a", $"b", graft.functions.HashColumns
        .equalFraction($"sig_a", $"sig_b").as("est_jaccard"))
      .filter($"est_jaccard" >= 0.8)
      .select($"a", $"b", round($"est_jaccard", 4).as("est_jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    val fast = Dedup.minhashDupPairs(docs, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(fast == naive)
    docs.unpersist()
  }

  test("substring dup stats: exact-copy docs are fully duplicated") {
    val docs = Tables(spark, sf).documents
    // pick one text with an exact twin and >= 8 tokens
    val twins = docs.groupBy("text")
      .agg(count(lit(1)).as("n"), collect_list("doc_id").as("ids"))
      .filter($"n" > 1 && size(split($"text", " ")) >= 8)
      .select("ids").as[Seq[Long]].collect()
    val stats = Dedup.substringDups(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats.values.forall(r => r._3 <= r._2), "dup windows > windows")
    assert(stats.values.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    if (twins.nonEmpty) {
      twins.head.foreach { id =>
        val (_, n, nd, ratio) = stats(id)
        assert(n > 0 && nd == n && ratio == 1.0,
          s"doc $id of an exact-copy group: $nd/$n dup windows")
      }
    }
  }

  test("repetition signals on hand-built repetitive vs clean docs") {
    val docs = Seq(
      // "a b" x5: 10 tokens / 2 distinct → dup_token 0.8; 9 2-grams,
      // all duplicated; top gram "a b" appears 5/9
      (1L, "a b a b a b a b a b"),
      // all distinct: every ratio's numerator count is 1 → top 1/5, dup 0
      (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs)
      .as[(Long, Double, Double, Double)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4)).toMap
    assert(r(1L) == ((0.8, 0.5556, 1.0)))
    assert(r(2L) == ((0.0, 0.2, 0.0)))
  }

  test("unigram logprob: exact on a known corpus, rare docs score lower") {
    // corpus: x appears 3 times, y 2, z 1 → total 6
    val docs = Seq((1L, "x x x"), (2L, "y y z")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramLogProb(docs)
      .as[(Long, Long, Double)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    val d1 = math.log(3.0 / 6.0)
    val d2 = (2 * math.log(2.0 / 6.0) + math.log(1.0 / 6.0)) / 3.0
    assert(r(1L)._1 == 3 && math.abs(r(1L)._2 - math.rint(d1 * 1e4) / 1e4) < 1e-9)
    assert(r(2L)._1 == 3 && math.abs(r(2L)._2 - math.rint(d2 * 1e4) / 1e4) < 1e-9)
    assert(r(2L)._2 < r(1L)._2, "rarer tokens → lower mean logprob")
  }

  test("bigram logprob: exact interpolated values on a known corpus") {
    // tokens: doc1 = a b a b, doc2 = a b → c1(a)=3, c1(b)=3, N=6
    // bigrams: (a,b)×3 (both docs), (b,a)×1
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLogProb(docs)
      .as[(Long, Long, Double)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    val pAB = 0.75 * 3.0 / 3.0 + 0.25 * 3.0 / 7.0 // N=7 incl. "solo"
    val pBA = 0.75 * 1.0 / 3.0 + 0.25 * 3.0 / 7.0
    val d1 = (2 * math.log(pAB) + math.log(pBA)) / 3.0
    val d2 = math.log(pAB)
    assert(r(1L)._1 == 3 && math.abs(r(1L)._2 - math.rint(d1 * 1e4) / 1e4) < 1e-9)
    assert(r(2L)._1 == 1 && math.abs(r(2L)._2 - math.rint(d2 * 1e4) / 1e4) < 1e-9)
    // a single-token doc has no bigrams and scores 0
    assert(r(3L) == ((0L, 0.0)))
    // repeated common bigrams score higher than rare ones
    assert(r(2L)._2 > math.log(pBA))
  }

  test("bigram logprob: above-gate shuffle-join path is identical to the broadcast path") {
    // r12 (VERDICT r11 #1): the LM broadcast is gated on bigram-type
    // count — above the gate the score join must stay a plain shuffle
    // join (an unpruned 100 TB bigram LM exceeds the broadcast cap)
    // with IDENTICAL results. Gate forced below the corpus's 2 bigram
    // types; auto-broadcast disabled so the un-hinted join genuinely
    // plans as a shuffle join on the toy table.
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val expected = TextAnalysis.bigramLogProb(docs).collect().toSeq
    val savedGate = TextAnalysis.BigramBroadcastMaxRows
    val savedThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      TextAnalysis.BigramBroadcastMaxRows = 1L
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val gated = TextAnalysis.bigramLogProb(docs)
      // the LM join must not be a broadcast join in the gated plan (the
      // vocab-sized uni joins keep their explicit hints)
      val smj = gated.queryExecution.sparkPlan.toString()
      assert(smj.contains("SortMergeJoin") || smj.contains("ShuffledHashJoin"),
        "above the gate the (w1, w2) LM join must be a shuffle join")
      assert(gated.collect().toSeq == expected)
    } finally {
      TextAnalysis.BigramBroadcastMaxRows = savedGate
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThresh)
    }
  }

  test("temperature mix: weights sum to 1, flatten the distribution, counts consistent") {
    val r = graft.operators.Curation.temperatureMix(spark, sf).cache()
    val rows = r.as[(String, Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, "weights must sum to ~1")
    rows.foreach { case (_, n, w, rate, kept) =>
      assert(w > 0 && rate > 0 && rate <= 1.0)
      assert(kept <= n)
      // the sampler must land near rate·n (md5 buckets are uniform)
      assert(math.abs(kept - rate * n) <= math.max(10.0, 0.2 * n),
        s"kept $kept far from ${rate * n}")
    }
    // α-flattening: a source's share of the sample exceeds its share of
    // the corpus iff it is smaller than average → rarest source gains
    val total = rows.map(_._2).sum.toDouble
    val smallest = rows.minBy(_._2)
    assert(smallest._3 >= smallest._2 / total - 1e-9,
      "sqrt weighting must never downweight the rarest source")
  }

  test("gopher rules: keep is exactly the conjunction of the rule flags") {
    val r = TextAnalysis.gopherRules(spark, sf).cache()
    assert(r.count() == graft.Tables(spark, sf).documents.count())
    assert(r.filter($"keep" =!= $"r_word_count" * $"r_mean_len" * $"r_stopwords")
      .count() == 0)
    assert(r.filter($"keep" === 1 && $"n_words" < 50).count() == 0)
    val kept = r.filter($"keep" === 1).count()
    assert(kept > 0 && kept < r.count(), "rules must actually discriminate")
  }

  test("dsir weights: target-language docs score higher than the rest") {
    val r = graft.operators.Curation.dsirWeights(spark, sf)
      .join(graft.Tables(spark, sf).documents.select("doc_id", "lang"), "doc_id")
      .cache()
    assert(r.count() == graft.Tables(spark, sf).documents.count())
    // n_feats = tokens + bigrams = 2n - 1 for every non-empty doc
    assert(r.filter($"n_feats" % 2 === 0).count() == 0)
    // the whole point of importance weighting: the target domain (en)
    // must score strictly above every other language on average
    val byLang = r.groupBy("lang").agg(avg("dsir_logw").as("m"))
      .as[(String, Double)].collect().toMap
    byLang.filter(_._1 != "en").foreach { case (l, m) =>
      assert(byLang("en") > m, s"en ${byLang("en")} must beat $l $m")
    }
  }

  test("contamination: eval docs excluded, ratios bounded") {
    val r = graft.operators.Curation.contamination(spark, sf).cache()
    assert(r.filter($"doc_id" % 50 === 0).count() == 0, "eval docs must not be scored")
    assert(r.filter($"n_contaminated" > $"n_windows").count() == 0)
    assert(r.filter($"contamination_ratio" < 0 || $"contamination_ratio" > 1).count() == 0)
    // an exact copy of an eval doc (if any copy group spans the eval
    // boundary) must be 100% contaminated — verified via the oracle at
    // sf0.01; here assert the ratio column is consistent with counts
    val bad = r.filter($"n_windows" > 0 &&
      abs($"contamination_ratio" - round($"n_contaminated" / $"n_windows", 4)) > 1e-9)
    assert(bad.count() == 0)
  }

  test("sequence packing: offsets chain within each shard") {
    val r = graft.operators.Curation.sequencePacking(spark, sf).cache()
    assert(r.count() == Tables(spark, sf).documents.count())
    // within a shard, start offsets are strictly increasing with doc_id
    // and consecutive docs abut: start(next) = start(prev) + n_tokens
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
    val chained = r
      .withColumn("start", $"seq_id" * 2048 + $"seq_offset")
      .withColumn("prev_end",
        lag($"seq_id" * 2048 + $"seq_offset" + $"n_tokens", 1).over(w))
      .filter($"prev_end".isNotNull && $"start" =!= $"prev_end")
    assert(chained.count() == 0)
    assert(r.filter($"seq_offset" < 0 || $"seq_offset" >= 2048).count() == 0)
  }

  test("doc chunking: spans tile every token, overlap = window - stride") {
    val r = graft.operators.Curation.docChunks(spark, sf).cache()
    val docs = Tables(spark, sf).documents
      .select($"doc_id", size(split($"text", "\\s+")).as("n"))
    // chunk starts advance by exactly the stride; chunk 0 starts at 1
    val badStart = r.filter($"start_tok" =!= $"chunk_idx" * 24 + 1)
    assert(badStart.count() == 0)
    // per doc: every token covered — last chunk reaches n, full chunks
    // carry `window` tokens, and the tail carries the remainder
    val cover = r.groupBy("doc_id")
      .agg(max($"start_tok" + $"n_tokens" - 1).as("covered"),
        count(lit(1)).as("n_chunks"))
      .join(docs, "doc_id")
    assert(cover.filter($"covered" =!= $"n").count() == 0)
    // expected chunk count is closed-form: ceil(n / stride)
    assert(cover.filter($"n_chunks" =!= ceil($"n" / 24.0)).count() == 0)
    assert(r.filter($"n_tokens" < 1 || $"n_tokens" > 32).count() == 0)
    // content keys: a doc with >= 2 chunks re-hashes its overlap — md5
    // keys are distinct unless token windows coincide
    assert(r.select("chunk_md5").distinct().count() > 1)
    // r12: unpersist — suites share one session and run in parallel;
    // leaving this exact plan cached makes PlanQualitySpec's
    // doc-chunking scan test see an InMemoryRelation instead of the
    // parquet scan (a pre-existing order-dependent flake)
    r.unpersist()
  }

  test("line dedup: exact driver-side replay of boilerplate removal") {
    val got = graft.operators.Curation.lineDedup(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toMap
    // limit -1 split: Java's String.split drops TRAILING empty tokens
    // while the product's Spark split (and DuckDB string_split_regex)
    // keep them — a doc with trailing whitespace would make this
    // replay disagree with both engines (ADVICE r10)
    val ws = java.util.regex.Pattern.compile("\\s+")
    val docs = Tables(spark, sf).documents.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> ws.split(r.getString(1), -1).toSeq)
    val segsByDoc = docs.map { case (id, toks) =>
      (id, toks.length, toks.grouped(3).toSeq)
    }
    val freq = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, _, segs) <- segsByDoc; g <- segs if g.length == 3) {
      val k = g.mkString(" ")
      freq(k) = freq.getOrElse(k, Set.empty) + id
    }
    val boiler = freq.collect { case (k, ids) if ids.size >= 3 => k }.toSet
    assert(boiler.nonEmpty, "corpus should contain repeated segments")
    var removedSomewhere = false
    for ((id, nTok, segs) <- segsByDoc) {
      val kept = segs.filter(g => g.length < 3 || !boiler(g.mkString(" ")))
      if (kept.length != segs.length) removedSomewhere = true
      val keptText = kept.map(_.mkString(" ")).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(keptText.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val exp = (nTok.toLong, segs.count(_.length == 3).toLong,
        (segs.length - kept.length).toLong,
        kept.map(_.length.toLong).sum, md)
      assert(got(id) == exp, s"doc $id: got ${got(id)}, want $exp")
    }
    assert(removedSomewhere, "removal should fire on this corpus")
    assert(got.size == docs.length)
  }

  test("lsh plan: exact replay of the S-curve scoring on the cached pairs") {
    val got = Dedup.lshPlan(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    val ests = Dedup.cachedMinhashPairs(sf, Tables(spark, sf).documents, 0.8)
      .select("est_jaccard").collect().map(_.getDouble(0))
    assert(ests.nonEmpty)
    val hist = ests.groupBy(e => math.round(e * 128).toInt)
      .view.mapValues(_.length.toLong).toMap
    def p(k: Int, r: Int, b: Int): Double =
      1.0 - math.pow(1.0 - math.pow(k / 128.0, r), b)
    val n = hist.values.sum
    for ((b, r) <- Seq((4, 32), (8, 16), (16, 8), (32, 4), (64, 2))) {
      val cp = hist.map { case (k, c) => math.round(p(k, r, b) * c * 1e6) }.sum
      val fpm = (0 until 103).map(k => math.round(p(k, r, b) / 128.0 * 1e6)).sum
      val t50 = BigDecimal(math.pow(1.0 / b, 1.0 / r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val caught = math.round(cp / (n * 100.0))
      assert(got((b, r)) == ((t50, caught, fpm)),
        s"($b,$r): got ${got((b, r))}, want ($t50, $caught, $fpm)")
    }
    // the structural tradeoff: more bands -> lower midpoint, more
    // caught, more false-accept area — monotone along the config list
    val byBands = got.toSeq.sortBy(_._1._1).map(_._2)
    assert(byBands.map(_._1) == byBands.map(_._1).sorted.reverse)
    assert(byBands.map(_._2) == byBands.map(_._2).sorted)
    assert(byBands.map(_._3) == byBands.map(_._3).sorted)
  }

  test("source divergence: identical, disjoint and hand-computed mixed pairs") {
    def js(corpus: Seq[(String, String)]): Map[(String, String), Double] =
      TextAnalysis.sourceDivergenceOf(
        corpus.toDF("source", "text"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    // identical distributions -> 0; disjoint vocabularies -> 1 bit
    val r1 = js(Seq("A" -> "a a b", "B" -> "a a b", "C" -> "x y z"))
    assert(r1(("A", "B")) == 0.0)
    assert(r1(("A", "C")) == 1.0 && r1(("B", "C")) == 1.0)
    // mixed pair, expected value from the same quantization replayed
    val r2 = js(Seq("A" -> "a a b", "B" -> "a b b"))
    def term(p1: Double, p2: Double): Long =
      math.round((p1 * (math.log(p1 * 2.0 / (p1 + p2)) / math.log(2.0))
        + p2 * (math.log(p2 * 2.0 / (p1 + p2)) / math.log(2.0)))
        * 0.5 * 1e6)
    val micro = term(2.0 / 3, 1.0 / 3) + term(1.0 / 3, 2.0 / 3)
    assert(r2(("A", "B")) ==
      BigDecimal(micro / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // real corpus: C(S,2) rows, all within [0,1], symmetric key order
    val full = TextAnalysis.sourceDivergence(spark, sf).cache()
    val nSrc = Tables(spark, sf).documents.select("source")
      .distinct().count()
    assert(full.count() == nSrc * (nSrc - 1) / 2)
    assert(full.filter($"js_bits" < 0 || $"js_bits" > 1).count() == 0)
    assert(full.filter($"vocab_common" >
      least($"vocab_a", $"vocab_b")).count() == 0)
  }

  test("curated-corpus sink: language-partitioned parquet round-trips the kept set") {
    val out = java.nio.file.Files.createTempDirectory("graft-curated").toString
    try {
      val n = graft.operators.Curation.writeCuratedCorpus(spark, sf, out)
      val wantKeep = graft.operators.Curation.curationDecisions(spark, sf)
        .filter($"keep" === 1).count()
      assert(n == wantKeep, s"sink wrote $n, decisions keep $wantKeep")
      // hive-style language partitions exist and prune on read
      val dirs = new java.io.File(out).listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang_pred=")), dirs)
      val back = spark.read.parquet(out)
      assert(back.columns.toSet ==
        Set("doc_id", "text", "source", "quality", "lang_pred"))
      // no dropped doc leaks into the curated output
      val dropped = graft.operators.Curation.curationDecisions(spark, sf)
        .filter($"keep" === 0).select("doc_id")
      assert(back.join(dropped, "doc_id").count() == 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(out))
    }
  }

  test("multimodal feature extraction is deterministic with real plumbing") {
    val a = Multimodal.multimodalMeta(spark, sf).collect()
    val b = Multimodal.multimodalMeta(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.length > 0)
    val formats = a.map(_.getString(1)).toSet
    assert(formats == Set("image", "audio", "video"))
  }

  test("ngram novelty: short docs yield no grams, firsts are novel, repeats are not") {
    // doc 3 repeats doc 1's trigrams verbatim; docs 10/11 are too short
    // to have ANY trigram (the sequence(0, size-3) descending-range trap)
    val docs = Seq(
      (1L, "a b c d"),          // grams: "a b c", "b c d" — both novel
      (3L, "a b c d"),          // same grams, first seen in doc 1 → novel 0
      (5L, "x y z"),            // one fresh gram → novel 1
      (10L, "solo"),            // 1 token → absent from output
      (11L, "two tokens"))      // 2 tokens → absent from output
      .toDF("doc_id", "text")
    val r = TextAnalysis.ngramNoveltyOf(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4)).toMap
    assert(r.keySet == Set(1L, 3L, 5L), s"short docs must vanish: ${r.keySet}")
    assert(r(1L) == ((2L, 2L, 1.0)))
    assert(r(3L) == ((2L, 0L, 0.0)))
    assert(r(5L) == ((1L, 1L, 1.0)))
  }

  test("hash embedding: signed hashing trick invariants hold") {
    val r = TextAnalysis.hashEmbedding(spark, sf, dims = 16).cache()
    // dims live in [0, 16); values are nonzero-able integers; sparse
    assert(r.filter($"dim" < 0 || $"dim" >= 16).count() == 0)
    assert(r.count() > 0)
    // deterministic across runs
    val a = r.collect().toSeq
    val b = TextAnalysis.hashEmbedding(spark, sf, dims = 16).collect().toSeq
    assert(a == b)
    // additivity of the linear featurizer: sum over a doc's rows equals
    // the sum of its tokens' signs — check via a doc's total: |value|
    // sum per doc is bounded by its token count
    val docs = Tables(spark, sf).documents
      .select($"doc_id", size(split($"text", "\\s+")).as("n"))
    val tot = r.groupBy("doc_id").agg(sum(abs($"value")).as("massa"))
      .join(docs, "doc_id")
    assert(tot.filter($"massa" > $"n").count() == 0,
      "signed mass cannot exceed token count")
    r.unpersist()
  }

  test("word entropy: bounds + exact value on all-distinct docs") {
    val r = TextAnalysis.wordEntropy(spark, sf).cache()
    assert(r.count() > 0)
    // 0 <= H <= log2(n_tokens); ttr in (0, 1]
    assert(r.filter($"entropy" < 0 || $"ttr" <= 0 || $"ttr" > 1).count() == 0)
    // ttr == 1 (all tokens distinct, uniform dist) => H == log2(types)
    val uni = r.filter($"ttr" === 1.0).collect()
    uni.foreach { row =>
      val h = row.getAs[Double]("entropy")
      // recover types from H: entropy of uniform over k = log2 k
      assert(h >= 0 && math.abs(math.pow(2, h) - math.round(math.pow(2, h)))
        < 1e-3, s"uniform doc entropy $h is not log2 of an integer")
    }
  }

  test("random projection: deterministic, k dims per vector, JL-shaped") {
    import graft.operators.Ann
    val r = Ann.randomProjection(spark, sf, k = 8).cache()
    val n = Tables(spark, sf).embeddings.count()
    assert(r.count() == n * 8)
    val a = r.collect().toSeq
    val b = Ann.randomProjection(spark, sf, k = 8).collect().toSeq
    assert(a == b)
    // projections are nondegenerate: not all dims collapse to zero
    assert(r.filter($"proj" =!= 0.0).count() > 0)
  }

  test("readability matches a local regex replay per document") {
    val docs = graft.Tables(spark, sf).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = graft.operators.TextAnalysis.readability(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == docs.map(_._1).toSet)
    for ((id, text) <- docs) {
      val w = text.split("\\s+", -1).length.toLong
      val s = math.max("[.!?]+".r.findAllIn(text).size, 1).toLong
      val sy = "[aeiouyAEIOUY]+".r.findAllIn(text).size.toLong
      val flesch = BigDecimal(206.835 - 1.015 * (w.toDouble / s)
        - 84.6 * (sy.toDouble / w))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == ((w, s, sy, flesch)), s"doc $id: ${got(id)}")
    }
  }

  test("paired quality covers every doc once, means bounded by extremes") {
    val docs = graft.Tables(spark, sf).documents.count()
    val rows = graft.operators.Multimodal.pairedQuality(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).sorted.toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_._2).sum == docs) // every doc pairs exactly once
    val q = graft.operators.TextAnalysis.qualityScores(spark, sf)
      .select("quality").collect().map(_.getDouble(0))
    rows.foreach { case (_, _, mq, mn) =>
      assert(mq >= q.min - 1e-9 && mq <= q.max + 1e-9)
      assert(mn > 0.0 && mn < math.sqrt(8.0)) // 8 features in [0,1)
    }
  }

  test("dedup threshold sweep: monotone retention curve, counts consistent") {
    val nDocs = graft.Tables(spark, sf).documents.count()
    val rows = graft.operators.Dedup.dedupThresholdSweep(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(80, 90, 95))
    rows.foreach { case (_, nPairs, nCl, nDup, nSurv) =>
      assert(nSurv == nDocs - nDup + nCl) // one survivor kept per cluster
      assert(nDup == 0 || nDup > nCl)     // multi-member clusters only
      assert(nPairs >= nCl.max(0))
    }
    // stricter thresholds: fewer pairs, fewer dups, more survivors
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._4 <= lo._4 && hi._5 >= lo._5)
    }
  }
}
