package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL document ingestion — the raw-crawl entry point of a training
  * corpus (one JSON object per line: id / text / metadata), read with
  * an EXPLICIT schema so no sampling inference pass touches the data.
  *
  * Scale rationale: JSONL is splittable, so a 100 TB drop parallelizes
  * by file block with no coordination; the explicit schema avoids
  * Spark's inference job (a full extra scan at that size) and pins
  * column types against drifting producers. Corrupt lines are CAPTURED,
  * not dropped: PERMISSIVE mode routes unparseable records into
  * `_corrupt_record`, and [[readDocs]] splits the stream into (clean,
  * corrupt) so the pipeline can quarantine bad shards instead of
  * silently shrinking — the observability difference between
  * DROPMALFORMED and a production ingest.
  *
  * Missing `doc_id`s are derived deterministically from the text
  * (non-cryptographic 64-bit hash, sign-cleared) so re-ingesting the
  * same corpus yields the same ids on any cluster layout — the same
  * membership-stability argument as the md5 holdout split. */
object JsonDocsSource {

  /** The documents-table schema plus the corrupt-record capture slot. */
  private[sources] val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("_corrupt_record", StringType, nullable = true)))

  /** Read a JSONL drop → (clean documents, corrupt raw lines).
    *
    * Clean rows get the derived schema of the documents table
    * (doc_id, text, lang, source, n_chars); rows missing doc_id are
    * assigned the deterministic text hash; rows without text are
    * corrupt by definition. */
  def readDocs(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // PERMISSIVE keeps parsed columns null + the raw line in the
      // capture slot for bad records; a JSON object that parses but
      // carries no text is equally unusable — quarantine it too.
      .withColumn("_bad",
        col("_corrupt_record").isNotNull || col("text").isNull)
    val corrupt = raw.filter(col("_bad"))
      .select(coalesce(col("_corrupt_record"),
        to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source")))).as("raw_line"))
    val clean = raw.filter(!col("_bad"))
      .select(
        coalesce(col("doc_id"),
          pmod(xxhash64(col("text")), lit(Long.MaxValue))).as("doc_id"),
        col("text"),
        coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"),
        length(col("text")).cast("long").as("n_chars"))
    (clean, corrupt)
  }

  /** Ingest report: clean/corrupt line counts plus per-source clean
    * totals — the shard-quarantine decision surface. */
  def ingestReport(spark: SparkSession, path: String): DataFrame = {
    val (clean, corrupt) = readDocs(spark, path)
    val bySource = clean.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
    val corruptRow = corrupt.agg(count(lit(1)).as("n_docs"))
      .select(lit("_corrupt").as("source"), col("n_docs"),
        lit(0L).as("n_chars"))
    bySource.unionByName(corruptRow).orderBy("source")
  }
}
