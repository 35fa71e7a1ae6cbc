package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Document deduplication for training-data pipelines, at shuffle-minimal
  * designs:
  *
  *   - exact:    one hash-groupBy on the text (map-side partial agg);
  *   - MinHash:  signatures computed entirely map-side with higher-order
  *               functions (no explode shuffle), LSH band join produces
  *               candidate pairs only — never |D|²;
  *   - SimHash:  64-bit signature map-side, 16-bit chunk bucketing
  *               (guarantees recall for hamming ≤ 3 within 4 chunks);
  *   - n-gram Jaccard: exact verification joined onto LSH candidates.
  *
  * All hash functions are Spark-native `xxhash64` (codegen'd) — no UDFs
  * in any hot path.
  */
object Dedup {

  private def tokens(c: Column): Column = split(c, " ")

  // ---------- exact ----------

  /** Exact dedup: canonical representative (min doc_id) per distinct
    * text. Survivors carry the duplicate-group size. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  // ---------- MinHash + LSH ----------

  /** 128-permutation MinHash signature over the unigram shingle set,
    * computed map-side: sig_i = min over shingles of xxhash64(i, tok).
    * Returns (doc_id, sig: array<long>). */
  def minhashSignatures(docs: DataFrame, numPerm: Int = 128): DataFrame = {
    val sh = array_distinct(tokens(col("text")))
    val sig = array((0 until numPerm).map { i =>
      aggregate(sh, lit(Long.MaxValue),
        (acc, x) => least(acc, xxhash64(lit(i), x)))
    }: _*)
    docs.select(col("doc_id"), sig.as("sig"))
  }

  /** LSH candidate pairs from banded signatures; `bands` × `rowsPerBand`
    * must equal the signature length. Shuffles once on the band bucket
    * key; bucket fan-out is bounded by duplicate-group size, not corpus
    * size. Returns (a, b, est_jaccard) for pairs whose estimated Jaccard
    * (matching signature fraction) ≥ threshold. */
  def minhashDupPairs(docs: DataFrame, threshold: Double = 0.9,
                      numPerm: Int = 128, bands: Int = 8): DataFrame = {
    val rowsPerBand = numPerm / bands
    val sigs = minhashSignatures(docs, numPerm)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col("doc_id"), posexplode(
      array((0 until bands).map { b =>
        xxhash64(lit(b) +: (0 until rowsPerBand)
          .map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
      }: _*)).as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("b"))
    val cand = l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val estSim = cand
      .join(sigs.select(col("doc_id").as("a"), col("sig").as("sig_a")), "a")
      .join(sigs.select(col("doc_id").as("b"), col("sig").as("sig_b")), "b")
      .select(col("a"), col("b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _),
          x => x)) / lit(numPerm.toDouble)).as("est_jaccard"))
    estSim.filter(col("est_jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** Exact n-gram (unigram-shingle) Jaccard verification on the LSH
    * candidates — the verify stage of the dedup pipeline. */
  def ngramJaccardPairs(docs: DataFrame, candThreshold: Double = 0.8,
                        jaccardThreshold: Double = 0.8): DataFrame = {
    val cand = minhashDupPairs(docs, candThreshold)
    val sets = docs.select(col("doc_id"),
      array_distinct(tokens(col("text"))).as("toks"))
    cand
      .join(sets.select(col("doc_id").as("a"), col("toks").as("ta")), "a")
      .join(sets.select(col("doc_id").as("b"), col("toks").as("tb")), "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over the token multiset, map-side: bit j of the
    * signature is the sign of Σ_tokens (2·bit_j(xxhash64(tok)) − 1). */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    // per-bit vote: aggregate over tokens accumulating 64 counters is
    // clearer as 64 independent aggregates (all codegen'd, one pass)
    val bitSums = (0 until 64).map { j =>
      aggregate(toks, lit(0L),
        (acc, x) => acc + shiftright(xxhash64(x), j).bitwiseAND(lit(1L)) * 2 - 1)
    }
    val sim = bitSums.zipWithIndex.map { case (s, j) =>
      when(s > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    docs.select(col("doc_id"), sim.as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming, candidates
    * from 16-bit chunk buckets (4 chunks ⇒ any pair within hamming 3
    * shares ≥ 1 chunk — pigeonhole; exact recall for the threshold). */
  def simhashDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val chunked = sigs.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("chunk", "val")))
    val l = chunked.select(col("chunk"), col("val"),
      col("doc_id").as("a"), col("simhash").as("sa"))
    val r = chunked.select(col("chunk"), col("val"),
      col("doc_id").as("b"), col("simhash").as("sb"))
    l.join(r, Seq("chunk", "val"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
