package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end curation surface of a training-data pipeline: the
  * per-document keep/drop decision composing exact dedup, near-dup
  * clustering, quality scoring and language ID — plus the deterministic
  * stratified sampler that rebalances the kept corpus across languages
  * (the "data mixing" step that follows curation in a real pipeline).
  *
  * Everything here REUSES the session-cached building blocks (LSH pair
  * graph, CC labels) rather than recomputing them — at 100 TB the dedup
  * pipeline is run once and its artifacts are consumed by every
  * downstream decision query.
  */
object Curation {

  /** Per-document curation decision. Flags (int 0/1 for portability):
    *   - exact_dup: not the min-id member of an identical-text group;
    *   - near_dup:  non-survivor member of an LSH near-dup cluster
    *                (survivor = min id = CC component label);
    *   - keep: no flag set, quality ≥ minQuality, language determined.
    *
    * Scale shape: the exact flag is one window-min over the text key
    * (same single shuffle as exact dedup); the near flag joins the
    * session-cached CC labels of the pair graph; quality/langid are
    * row-local projections. Nothing new shuffles beyond a doc_id join.
    */
  def curationDecisions(spark: SparkSession, dir: String,
                        minQuality: Double = 0.6): DataFrame = {
    val docs = Tables(spark, dir).documents
    val byText = Window.partitionBy("text")
    val exact = docs.select(col("doc_id"),
      (col("doc_id") =!= min("doc_id").over(byText)).cast("int").as("exact_dup"))
    val near = Dedup.nearDupComponents(spark, docs, cacheKey = dir)
      .select(col("id").as("doc_id"),
        (col("id") =!= col("component")).cast("int").as("near_dup"))
    val quality = TextAnalysis.qualityScores(spark, dir)
      .select("doc_id", "quality")
    val lang = TextAnalysis.langId(spark, dir).select("doc_id", "lang_pred")
    exact
      .join(near, Seq("doc_id"), "left").na.fill(0, Seq("near_dup"))
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .select(col("doc_id"), col("exact_dup"), col("near_dup"),
        col("quality"), col("lang_pred"),
        when(col("exact_dup") === 0 && col("near_dup") === 0 &&
             col("quality") >= minQuality && col("lang_pred") =!= "und",
          lit(1)).otherwise(lit(0)).as("keep"))
    // NO output ordering: the correctness gate sorts rows itself, and a
    // global orderBy here would be a full-corpus sort at 100 TB
  }

  /** Curated-corpus SINK: the kept documents written as parquet,
    * PARTITIONED BY predicted language and sorted by doc_id within
    * each file — the handoff artifact a training pipeline reads next.
    * Partitioning by language gives downstream per-language readers
    * partition pruning for free; sortWithinPartitions keeps row
    * groups doc_id-clustered so id-range scans skip pages. Returns
    * the kept-row count (the number a pipeline run logs).
    *
    * Scale shape: one decision join against the session-cached
    * curation table, one shuffle on the partition key; writer
    * parallelism = shuffle partitions per language. */
  def writeCuratedCorpus(spark: SparkSession, dir: String,
                         outDir: String): Long = {
    val docs = Tables(spark, dir).documents
    val dec = curationDecisions(spark, dir)
      .filter(col("keep") === 1)
      .select("doc_id", "quality", "lang_pred")
    val curated = docs.join(dec, "doc_id")
      .select(col("doc_id"), col("text"), col("source"),
        col("quality"), col("lang_pred"))
    curated
      .repartition(col("lang_pred"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite")
      .partitionBy("lang_pred")
      .parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  /** Corpus-level curation yield: the decision table aggregated per
    * predicted language — doc counts, dup counts, kept counts, mean
    * quality. What a pipeline dashboard reports after a curation run;
    * one tiny groupBy over the (reused) decision table. */
  def curationReport(spark: SparkSession, dir: String): DataFrame =
    curationDecisions(spark, dir)
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        sum("exact_dup").as("n_exact_dup"),
        sum("near_dup").as("n_near_dup"),
        sum("keep").as("n_keep"),
        round(avg("quality"), 4).as("avg_quality"))
      .orderBy("lang_pred")

  /** Deterministic train/val/test holdout split: each doc hashes to a
    * stable md5 bucket in [0, 100) → train <90, val <95, test rest —
    * the reproducible dataset split every training run needs (the same
    * doc lands in the same split on any engine, any partitioning, any
    * rerun; changing corpus membership never reshuffles other docs'
    * assignments, unlike row_number-based splits). Pure map-side
    * projection; the report is one tiny groupBy. */
  def holdoutSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("string"))), 1, 7), 16, 10)
      .cast("long") % 100
    Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"),
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split", "lang")
  }

  /** Deterministic stratified sampler (language rebalancing): each doc
    * hashes to a stable md5 bucket in [0, 100); a doc survives when its
    * bucket falls under its language's rate (en downsampled hardest —
    * the overrepresented stratum — zh lightly, the rest kept whole).
    * Pure map-side projection + filter: samples identically on any
    * engine, any partitioning, any run — reproducible mixing is what
    * makes a 100 TB data recipe auditable. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(concat(lit("mix:"),
      col("doc_id").cast("string"))), 1, 7), 16, 10)
      .cast("long") % 100
    val rate = when(col("lang") === "en", 40)
      .when(col("lang") === "zh", 60).otherwise(100)
    Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"), bucket.cast("int").as("bucket"))
      .filter(col("bucket") < rate)
      .orderBy("doc_id")
  }

  /** Temperature-scaled mixture sampling (the α-power reweighting every
    * multilingual / multi-source LLM recipe uses, α = 0.5 here so the
    * power is an exact IEEE sqrt in every engine): source weights
    * w_s ∝ n_s^α flatten the source distribution, per-source keep
    * rates hit a global target fraction, and the per-doc keep decision
    * is the same deterministic md5 bucket as [[stratifiedSample]] —
    * the sample is byte-identical on any engine or partitioning.
    * Output: the mixing RECIPE table (source, n_docs, weight,
    * keep_rate, n_kept) — what a data-recipe audit actually reviews.
    *
    * Scale shape: one map-side-combined groupBy for the counts, a
    * broadcast of the source-sized recipe back onto the doc stream,
    * one more tiny groupBy for n_kept. Nothing holds more than
    * |sources| rows of state. */
  def temperatureMix(spark: SparkSession, dir: String,
                     targetFraction: Double = 0.5): DataFrame = {
    val docs = Tables(spark, dir).documents
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(sqrt(col("n_docs"))).as("z"),
      sum("n_docs").as("n_total"))
    val recipe = counts.crossJoin(broadcast(tot))
      .withColumn("weight", round(sqrt(col("n_docs")) / col("z"), 6))
      .withColumn("keep_rate", least(lit(1.0),
        round(lit(targetFraction) * col("n_total") * col("weight") / col("n_docs"), 6)))
      .select("source", "n_docs", "weight", "keep_rate")
    val bucket = conv(substring(md5(concat(lit("mixt:"),
      col("doc_id").cast("string"))), 1, 7), 16, 10)
      .cast("long") % 10000
    val kept = docs.select(col("source"), bucket.cast("int").as("bucket"))
      .join(broadcast(recipe.select("source", "keep_rate")), "source")
      .filter(col("bucket") < col("keep_rate") * 10000)
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    recipe.join(kept, Seq("source"), "left")
      .na.fill(0L, Seq("n_kept"))
      .orderBy("source")
  }

  /** Epoch plan for a token budget: given the √-temperature source
    * weights (the [[temperatureMix]] recipe), how many tokens each
    * source must contribute and how many PASSES over its data that
    * means — epochs > 4 flags the over-repetition regime (repeating
    * data beyond ~4 epochs gives rapidly diminishing returns, so the
    * mix should be re-tempered or the source backfilled). The
    * planning table a data team signs off before a training run.
    * One source-keyed map-side-combined count + a 1-row broadcast;
    * everything after is |sources|-row arithmetic. */
  def epochPlan(spark: SparkSession, dir: String,
                budgetTokens: Long = 1000000L): DataFrame = {
    val toks = Tables(spark, dir).documents
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), "\\s+"))).as("n_tokens"))
    val z = toks.agg(sum(sqrt(col("n_docs"))).as("z"))
    toks.crossJoin(broadcast(z))
      .withColumn("weight", round(sqrt(col("n_docs")) / col("z"), 6))
      .withColumn("target_tokens",
        round(col("weight") * budgetTokens).cast("long"))
      .withColumn("epochs",
        round(col("target_tokens") / col("n_tokens").cast("double"), 4))
      .withColumn("oversampled", col("target_tokens") > col("n_tokens") * 4)
      .select("source", "n_docs", "n_tokens", "weight", "target_tokens",
        "epochs", "oversampled")
      .orderBy("source")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): each
    * language's documents split into head/middle/tail by LM-score
    * terciles — CCNet keeps "head" (lowest perplexity ⇒ here HIGHEST
    * bigram-LM log-likelihood) for training and drops or deboosts the
    * tail. Scores come from the oracle-proven [[TextAnalysis.bigramLogProb]];
    * tercile cuts are exact percentiles per language, 4-dp-pinned so
    * the ≥ bucket comparisons are engine-stable.
    *
    * Scale shape: the LM scoring is the one corpus pass bigramLogProb
    * already makes; the cut table is |langs| rows (sort-based exact
    * percentile per small group) broadcast back onto the doc stream. */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.bigramLogProb(spark, dir)
      .join(Tables(spark, dir).documents.select("doc_id", "lang"), "doc_id")
    val cuts = scored.groupBy("lang").agg(
      round(expr("percentile(avg_logprob, 2.0/3.0)"), 4).as("t_head"),
      round(expr("percentile(avg_logprob, 1.0/3.0)"), 4).as("t_mid"))
    scored.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("avg_logprob"),
        when(col("avg_logprob") >= col("t_head"), "head")
          .when(col("avg_logprob") >= col("t_mid"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  /** DSIR-style hashed n-gram importance weights (Xie et al., "Data
    * Selection for Language Models via Importance Resampling", 2023):
    * score every document by how much it resembles a TARGET domain
    * (here the English subset) relative to the RAW corpus. Features are
    * unigrams + adjacent bigrams, md5-hashed into 4096 buckets (the
    * engine-portable hash idiom — identical buckets everywhere); both
    * bucket distributions get add-1 smoothing, and a document's weight
    * is the MEAN per-feature log ratio ln(p_target/p_raw). Resampling
    * by these weights is the importance-resampling step that tilts a
    * web-scale corpus toward the target domain.
    *
    * Scale shape: the two bucket tables are ≤4096 rows (map-side
    * combined groupBys over the feature stream) and broadcast back onto
    * the stream; the per-doc mean is ONE doc_id-keyed shuffle — the
    * unigram-LM plan, nothing beyond the linear feature stream. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val b = 4096
    val docs = Tables(spark, dir).documents
    val toks = split(col("text"), "\\s+")
    val uni = docs.select(col("doc_id"), col("lang"), explode(toks).as("feat"))
    val bi = docs.select(col("doc_id"), col("lang"),
        explode(arrays_zip(slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1))).as("bg"))
      .select(col("doc_id"), col("lang"),
        concat(col("bg.0"), lit(" "), col("bg.1")).as("feat"))
    // the hashed feature stream feeds three consumers (raw counts,
    // target counts, scoring join); materialize it once
    val feats = uni.union(bi)
      .withColumn("bucket",
        (conv(substring(md5(concat(lit("dsir:"), col("feat"))), 1, 7), 16, 10)
          .cast("long") % b).cast("int"))
      .localCheckpoint(true)
    val raw = feats.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val tgt = feats.filter(col("lang") === "en")
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val totals = raw.agg(sum("cr").as("nr"))
      .crossJoin(tgt.agg(sum("ct").as("nt")))
    feats.join(broadcast(raw), "bucket")
      .join(broadcast(tgt), Seq("bucket"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        round(avg(log(
          ((col("ct") + 1.0) * (col("nr") + b)) /
            ((col("cr") + 1.0) * (col("nt") + b)))), 4).as("dsir_logw"))
      .orderBy("doc_id")
  }

  /** Benchmark-contamination check: the fraction of each training
    * document's w-token windows that also appear in the held-out
    * evaluation set (here: every 50th doc by id — a deterministic
    * stand-in for the benchmark corpus a real pipeline loads
    * separately). Train docs above a contamination threshold get
    * dropped before training; this is the n-gram-overlap
    * decontamination step every published LLM data pipeline runs.
    *
    * Scale shape: reuses the substring-dedup window-hash primitive; the
    * eval window set is distinct-collapsed (tiny vs the corpus) and the
    * membership test is a hash-keyed left join — never doc × doc. */
  def contamination(spark: SparkSession, dir: String, w: Int = 8): DataFrame = {
    val docs = Tables(spark, dir).documents
    val windows = Dedup.windowHashes(docs, w)
    val isEval = col("doc_id") % 50 === 0
    val evalWindows = windows.filter(isEval).select("wh").distinct()
    val perDoc = windows.filter(!isEval)
      .join(evalWindows.withColumn("hit", lit(1)), Seq("wh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("hit"), lit(0))).as("n_contaminated"))
    docs.filter(!isEval).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_windows", "n_contaminated"))
      .select(col("doc_id"), col("n_windows"), col("n_contaminated"),
        when(col("n_windows") > 0,
          round(col("n_contaminated") / col("n_windows"), 4))
          .otherwise(lit(0.0)).as("contamination_ratio"))
      .orderBy("doc_id")
  }

  /** Deterministic sequence packing — the step that turns a curated
    * corpus into fixed-length training sequences: documents are
    * concatenated within a shard (stable md5 shard, doc_id order) and
    * chunked into `seqLen`-token sequences; each doc lands at
    * (shard, seq_id, seq_offset) where its first token falls. The
    * running total is a per-shard window cumsum — parallelism is the
    * shard count (thousands at 100 TB), never a global sort, and the
    * placement is engine/partitioning/run-independent, so a training
    * run can be byte-reproduced from the recipe. */
  def sequencePacking(spark: SparkSession, dir: String,
                      seqLen: Int = 2048, shards: Int = 32): DataFrame =
    sequencePacking(Tables(spark, dir).documents, seqLen, shards)

  def sequencePacking(docs: DataFrame, seqLen: Int, shards: Int): DataFrame = {
    val shard = (conv(substring(md5(concat(lit("pack:"),
      col("doc_id").cast("string"))), 1, 7), 16, 10)
      .cast("long") % shards).cast("int")
    val byShard = Window.partitionBy("shard").orderBy("doc_id")
    docs
      .select(col("doc_id"), shard.as("shard"),
        size(split(col("text"), "\\s+")).as("n_tokens"))
      .withColumn("start_tok",
        sum("n_tokens").over(byShard) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("start_tok") / seqLen).as("seq_id"),
        (col("start_tok") % seqLen).cast("bigint").as("seq_offset"))
      .orderBy("doc_id")
  }

  /** Packing efficiency report per shard: sequence count (integer
    * ceil), tail utilization, and how many documents STRADDLE a
    * sequence boundary (those get split or padded at training time —
    * the packing-quality number loader teams watch). Rides
    * [[sequencePacking]]'s layout; one shard-keyed map-side-combined
    * aggregate over the (tiny) per-doc packing table. All integer
    * arithmetic until the final utilization ratio. */
  def packEfficiency(spark: SparkSession, dir: String,
                     seqLen: Int = 2048, shards: Int = 32): DataFrame =
    sequencePacking(spark, dir, seqLen, shards)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        expr(s"CAST((sum(n_tokens) + ${seqLen - 1}) div $seqLen AS BIGINT)")
          .as("n_seqs"),
        sum(when(col("seq_offset") + col("n_tokens") > seqLen, 1L)
          .otherwise(0L)).as("n_straddling"),
        round(sum("n_tokens") /
          (expr(s"CAST((sum(n_tokens) + ${seqLen - 1}) div $seqLen AS BIGINT)")
            * seqLen).cast("double"), 6).as("utilization"))
      .orderBy("shard")

  /** Overlapping token-window chunking — the retrieval/embedding-prep
    * counterpart of [[sequencePacking]]: each document is split into
    * `window`-token chunks every `stride` tokens (overlap = window −
    * stride keeps boundary context in both neighbors, the standard RAG
    * chunker). Emits one row per chunk with its token span and an md5
    * content key (the downstream join key for chunk-level dedup and
    * embedding tables).
    *
    * Purely row-local: split + sequence + slice are map-side array ops
    * (no shuffle, no window function — a doc's chunks never leave its
    * row), so the operator runs at scan speed on any corpus size and
    * parallelism is the file split count. Chunk starts are 1, 1+stride,
    * … while ≤ n_tokens, so every token lands in ≥1 chunk and the
    * layout is closed-form reproducible from (doc_id, n_tokens) alone.
    */
  def docChunks(spark: SparkSession, dir: String,
                window: Int = 32, stride: Int = 24): DataFrame =
    docChunks(Tables(spark, dir).documents, window, stride)

  def docChunks(docs: DataFrame, window: Int, stride: Int): DataFrame =
    chunkRows(docs, window, stride).orderBy("doc_id", "chunk_idx")

  /** The row-local chunking core WITHOUT the deterministic output sort
    * — directly usable on a STREAMING frame (ingest-time chunking:
    * sorts are illegal on unbounded input, and chunking a doc never
    * needs to leave its row anyway). */
  def chunkRows(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(stride >= 1 && window >= stride,
      s"need window >= stride >= 1, got window=$window stride=$stride")
    docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(1), size(col("toks")), lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        col("start").as("start_tok"),
        slice(col("toks"), col("start"), lit(window)).as("ct"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("ct")).as("n_tokens"),
        md5(concat_ws(" ", col("ct"))).as("chunk_md5"))
  }

  /** Chunk-level dedup report per source — the redundancy number a
    * RAG/embedding pipeline reads off the [[docChunks]] layout before
    * paying for embeddings: how many token-window chunks each source
    * contributes, how many are content-distinct (md5 key), and the
    * duplicated fraction in exact 1e-4 units (scale-0 quotient
    * rounding — the decimal-tie-safe idiom; see Ann.micro). One
    * source-keyed aggregate with map-side partial distinct; chunking
    * itself stays row-local. */
  def chunkDedupReport(spark: SparkSession, dir: String,
                       window: Int = 32, stride: Int = 24): DataFrame = {
    val docs = Tables(spark, dir).documents
    docChunks(docs, window, stride)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct("chunk_md5").as("n_unique_chunks"))
      .select(col("source"), col("n_chunks"), col("n_unique_chunks"),
        round((col("n_chunks") - col("n_unique_chunks")) * 10000.0
          / col("n_chunks")).cast("long").as("dup_per_10k"))
      .orderBy("source")
  }

  /** CCNet-style LINE-frequency boilerplate removal (Wenzek et al.
    * 2019 §3.1 dedups paragraphs by hash across the whole crawl;
    * RefinedWeb/Gopher drop lines that repeat across many documents —
    * nav bars, cookie banners, license footers). The corpus has no
    * newlines, so a "line" is a fixed non-overlapping `w`-token
    * segment (the same row-local segmentation as [[chunkRows]], stride
    * = window): a segment is boilerplate iff its exact text occurs in
    * ≥ `minDocs` DISTINCT documents. Output per doc: token count,
    * full-segment count, boilerplate-segment count, tokens kept after
    * removal, and the md5 of the REBUILT text (kept segments in
    * original order — the hash a downstream exact-dedup would key on),
    * so the whole removal is value-checked, not just counted.
    * Tail segments (< w tokens) are never boilerplate-eligible and are
    * always kept, matching the line-dedup convention that only full
    * lines are dropped.
    *
    * Scale shape: segmentation is row-local (posexplode of a stride
    * sequence); the frequency table is ONE segment-keyed aggregate
    * with map-side partials (the hottest boilerplate keys are exactly
    * the ones partial agg collapses before the shuffle — a banner in
    * 10M docs ships one (key, count) per task, and countDistinct's
    * first stage keys by (segtext, doc_id), which repeated segments
    * within one doc collapse map-side too); the flag-back is an
    * equi-join against the ≥ minDocs survivors, a set SHRUNK by the
    * frequency filter (≤ |segments|/minDocs keys, AQE broadcasts it
    * when small); the rebuild is one doc-keyed aggregate whose state
    * is bounded by a single document's length. No global sort — the
    * final orderBy is the deterministic report order. */
  def lineDedup(spark: SparkSession, dir: String,
                w: Int = 3, minDocs: Int = 3): DataFrame = {
    require(w >= 1 && minDocs >= 2, s"need w>=1 minDocs>=2, got $w $minDocs")
    val docs = Tables(spark, dir).documents
    val segs = lineSegments(docs, w)
    val boiler = boilerSegments(segs, w, minDocs).select("segtext")
    flagBoiler(segs, boiler, w)
      .groupBy("doc_id")
      .agg(lineDedupAggs(w).head, lineDedupAggs(w).tail: _*)
      .orderBy("doc_id")
  }

  /** Row-local fixed-window segmentation shared by [[lineDedup]], the
    * boiler-index writer and the streaming gate (ONE definition — the
    * three consumers cannot drift). `carry` threads extra columns
    * (e.g. the stream's event time) through the explode. */
  private[graft] def lineSegments(docs: DataFrame, w: Int,
                                  carry: Seq[String] = Nil): DataFrame = {
    val keep = (Seq("doc_id") ++ carry).map(col)
    docs
      .select(keep :+ split(col("text"), "\\s+").as("toks"): _*)
      .select(keep ++ Seq(size(col("toks")).as("n_tokens"), col("toks"),
        posexplode(sequence(lit(1), size(col("toks")), lit(w)))
          .as(Seq("seg", "start"))): _*)
      .select(keep ++ Seq(col("n_tokens"), col("seg"),
        concat_ws(" ", slice(col("toks"), col("start"), lit(w)))
          .as("segtext"),
        least(lit(w), col("n_tokens") - col("start") + lit(1))
          .as("seglen")): _*)
  }

  /** The boilerplate-frequency table: full segments occurring in
    * ≥ minDocs distinct docs. ONE map-side-combined aggregate. */
  private[graft] def boilerSegments(segs: DataFrame, w: Int,
                                    minDocs: Int): DataFrame =
    segs.filter(col("seglen") === w)
      .groupBy("segtext")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= minDocs)

  /** Left-join flag against a boilerplate segment set. */
  private[graft] def flagBoiler(segs: DataFrame, boiler: DataFrame,
                                w: Int): DataFrame =
    segs.join(boiler.select(col("segtext"))
        .withColumn("boiler_key", lit(true)), Seq("segtext"), "left")
      .withColumn("is_boiler",
        col("boiler_key").isNotNull && col("seglen") === w)

  /** The per-doc removal report aggregates — shared verbatim by the
    * batch report and the streaming gate so the two cannot drift. */
  private[graft] def lineDedupAggs(w: Int): Seq[Column] = Seq(
    max("n_tokens").cast("long").as("n_tokens"),
    sum(when(col("seglen") === w, 1L).otherwise(0L)).as("n_segments"),
    sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler_segments"),
    coalesce(sum(when(!col("is_boiler"), col("seglen").cast("long"))),
      lit(0L)).as("tokens_kept"),
    md5(concat_ws(" ", transform(
      array_sort(collect_list(when(!col("is_boiler"),
        struct(col("seg"), col("segtext"))))),
      x => x.getField("segtext")))).as("kept_md5"))

  /** Persist the boilerplate-frequency artifact (the nightly output a
    * CCNet-style deployment computes over the full crawl, then applies
    * at ingest time — the line-dedup analog of the LSH band index):
    * (segtext, nd) parquet. Returns the number of boilerplate
    * segments written. */
  def writeBoilerIndex(docs: DataFrame, out: String,
                       w: Int = 3, minDocs: Int = 3): Long = {
    boilerSegments(lineSegments(docs, w), w, minDocs)
      .write.mode("overwrite").parquet(out)
    docs.sparkSession.read.parquet(out).count()
  }

  /** Corpus-directory convenience of [[writeBoilerIndex]]. */
  def writeBoilerIndex(spark: SparkSession, dir: String, out: String):
      Long = writeBoilerIndex(Tables(spark, dir).documents, out)

  /** Load a persisted boiler index for batch or stream-static use. */
  def loadBoilerIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Deterministic token-weighted subsample: systematic resampling
    * (the particle-filter / data-mixing standard) over an md5-shuffled
    * doc order — k evenly spaced points on the cumulative TOKEN line
    * select docs with probability ∝ their token weight, giving a
    * budget-true subsample (heavy docs can't be missed, light ones
    * enter proportionally) with ZERO randomness at run time: the md5
    * shuffle IS the coin, so the sample is reproducible anywhere.
    *
    * All arithmetic is exact integers: doc d with cumulative token
    * range (lo, hi] is selected iff an odd multiple (2i+1)·W of the
    * total lands in (lo·2k, hi·2k] — no float ever touches the
    * membership test (the walk-corpus/percolation coin discipline).
    *
    * Scale shape: token counts are row-local; the global cumulative
    * line is [[Distributed.rankedPrefix]] (range exchange +
    * per-partition scan + broadcast offsets — never a single-partition
    * window); the membership test is map-side arithmetic. */
  def weightedSample(spark: SparkSession, dir: String,
                     k: Int = 50): DataFrame = {
    val scope = new graft.Materialize.Scoped()
    val docs = Tables(spark, dir).documents
    val weighted = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
      md5(concat(lit("wsamp:"), col("doc_id").cast("string"))).as("h"))
    val ranked = Distributed.rankedPrefix(scope.table(weighted),
      Seq(col("h").asc, col("doc_id").asc), col("n_tokens"),
      rankName = "rk", cumName = "hi", scope = scope)
    val w = ranked.agg(max("hi")).collect()(0).getLong(0)
    val out = ranked
      .withColumn("lo", col("hi") - col("n_tokens"))
      // smallest odd m with m*W > lo*2k, selected iff m*W <= hi*2k
      .withColumn("m0", expr(s"(lo * ${2 * k}) div $w + 1"))
      .withColumn("m", expr("IF(m0 % 2 = 0, m0 + 1, m0)"))
      .filter(expr(s"m * $w <= hi * ${2 * k} AND m < ${2 * k}"))
      .select("doc_id", "source", "n_tokens")
      .orderBy("doc_id")
    scope.seal(out)
  }
}
