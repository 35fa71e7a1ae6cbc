package graft.operators

import graft.Tables
import graft.functions.CosineSimilarity.cosineSim
import graft.functions.TopKByScore.topK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Similarity search over the embedding column.
  *
  *   - Brute-force: exact cosine top-k. Queries are broadcast, the
  *     corpus streams through ONCE, and the per-query top-k is reduced
  *     map-side by the TopKByScore aggregate — the shuffle carries only
  *     k rows per (partition, query), never the |corpus|×|queries|
  *     score matrix.
  *   - IVF: k-means-lite centroids → inverted cell index → probe the
  *     nProbe nearest cells per query. The scale path: search cost drops
  *     by ~|cells|/nProbe; cells are the partitioning key, so a cluster
  *     co-locates each cell's vectors.
  */
object Ann {

  /** Default query set: a small deterministic slice of the corpus. */
  private def queriesOf(emb: DataFrame, nQueries: Int): DataFrame =
    emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  /** Exact cosine top-k. Output: (query_id, rank, neighbor_id, sim). */
  /** Per-label mean embedding (class centroids — the aggregation step
    * of semantic dedup / cluster-based data mixing), long-form
    * (label, dim, centroid, n_vecs) so results stay hash-comparable
    * across engines without array-column ordering issues.
    *
    * Scale shape: posexplode is map-side (×dim rows, no shuffle); ONE
    * map-side-combined groupBy keyed (label, dim) — state is
    * labels×dim running (sum, count) pairs per partition, independent
    * of corpus size. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(round(avg(col("v")), 6).as("centroid"),
        count(lit(1)).as("n_vecs"))
      .orderBy("label", "dim")

  def knnBrute(spark: SparkSession, dir: String,
               nQueries: Int = 20, k: Int = 10): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val q = broadcast(queriesOf(emb, nQueries))
    emb.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineSim(col("q_emb"), col("embedding")).as("sim"))
      .groupBy("query_id")
      .agg(topK(col("vec_id"), col("sim"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("rank0", "nn")))
      .select(col("query_id"), (col("rank0") + 1).as("rank"),
        col("nn.neighbor_id").as("neighbor_id"),
        round(col("nn.score"), 6).as("sim"))
  }

  /** K-means-lite centroids: deterministic init (first `cells` vectors),
    * `iters` Lloyd rounds, all DataFrame algebra (posexplode + per-
    * dimension mean). Returns (cell, centroid: array<float>).
    *
    * Each round's mean is rounded to 6dp before the float cast: double
    * summation order differs across partial-agg orders and engines in
    * the last ulp, and rounding pins every centroid — hence every
    * assignment, probe and neighbor ranking — to values any engine
    * reproduces, which is what makes e_knn_ivf DuckDB-oracle-checkable
    * (same move as the portable MinHash/SimHash/walk pipelines). */
  def kmeansCentroids(emb: DataFrame, cells: Int = 16, iters: Int = 3): DataFrame = {
    var centroids = emb.filter(col("vec_id") < cells)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assignCells(emb, centroids)
      centroids = assigned
        .join(emb, "vec_id")
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(round(avg("x"), 6).as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("centroid"))
    }
    centroids
  }

  /** Nearest-centroid assignment: (vec_id, cell). */
  def assignCells(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"),
        struct(cosineSim(col("embedding"), col("centroid")).as("sim"),
          col("cell")).as("sc"))
      .groupBy("vec_id")
      .agg(max("sc").as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"))

  /** IVF ANN: probe the `nProbe` nearest cells per query.
    * Output shape identical to [[knnBrute]]. */
  def knnIvf(spark: SparkSession, dir: String, nQueries: Int = 20, k: Int = 10,
             cells: Int = 16, nProbe: Int = 4): DataFrame = {
    val emb = Tables(spark, dir).embeddings
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids = kmeansCentroids(emb, cells).persist(StorageLevel.MEMORY_AND_DISK)
    val index = assignCells(emb, centroids)
      .join(emb, "vec_id") // inverted index rows: (cell, vec_id, embedding)
    val q = queriesOf(emb, nQueries)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q_emb"), col("cell"),
        cosineSim(col("q_emb"), col("centroid")).as("csim"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("csim").desc, col("cell").asc)))
      .filter(col("rk") <= nProbe)
      .select("query_id", "q_emb", "cell")
    probes.join(index, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineSim(col("q_emb"), col("embedding")).as("sim"))
      .groupBy("query_id")
      .agg(topK(col("vec_id"), col("sim"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("rank0", "nn")))
      .select(col("query_id"), (col("rank0") + 1).as("rank"),
        col("nn.neighbor_id").as("neighbor_id"),
        round(col("nn.score"), 6).as("sim"))
  }

  /** Embedding-cosine near-duplicate pairs via random-hyperplane LSH:
    * 48-bit signatures → 6 bands of 8 bits → bucket join → exact cosine
    * filter. Candidates only — never the |D|² similarity matrix. */
  def embeddingNearDups(spark: SparkSession, dir: String,
                        threshold: Double = 0.35): DataFrame = {
    val emb = Tables(spark, dir).embeddings.persist(StorageLevel.MEMORY_AND_DISK)
    // portable planes: signatures and the candidate set reproduce in
    // plain SQL, so the whole pipeline is oracle-checkable
    val signed = emb.select(col("vec_id"), col("embedding"),
      graft.functions.HyperplaneLsh.hyperplaneLsh(col("embedding"),
        portable = true).as("sig"))
    val banded = signed.select(col("vec_id"), col("embedding"), posexplode(
      array((0 until 6).map(i =>
        shiftrightunsigned(col("sig"), i * 8).bitwiseAND(lit(0xFFL))): _*))
      .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"),
      col("vec_id").as("a"), col("embedding").as("ea"))
    val r = banded.select(col("band"), col("bucket"),
      col("vec_id").as("b"), col("embedding").as("eb"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosineSim(col("ea"), col("eb")).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
  }
}
