package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
      .orderBy("doc_id")
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
}
