package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Ann, Dedup, Multimodal, Relational, TextAnalysis}
import graft.graph.GraphQueries

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_top_revenue" -> (Relational.q3TopRevenue _),
    "q5_region_revenue" -> (Relational.q5RegionRevenue _),
    "q_mktseg_window" -> (Relational.qMktsegWindow _),
    "q_events_hourly" -> (Relational.qEventsHourly _),
    "q_order_priority" -> (Relational.qOrderPriority _),
    "g_edges" -> (GraphQueries.edges _),
    "g_degree" -> (GraphQueries.degree _),
    "g_degree_histogram" -> (GraphQueries.degreeHistogram _),
    "g_avg_degree" -> (GraphQueries.avgDegree _),
    "g_triangles" -> (GraphQueries.triangles _),
    "g_clustering_coeff" -> (GraphQueries.clusteringCoeff _),
    "g_avg_clustering" -> (GraphQueries.avgClustering _),
    "g_transitivity" -> (GraphQueries.transitivity _),
    "g_induced_subgraph" -> (GraphQueries.inducedSubgraph _),
    "g_connected_components" -> (GraphQueries.connectedComponents _),
    "g_label_propagation" -> (GraphQueries.labelPropagation _),
    "g_community_count" -> (GraphQueries.communityCount _),
    "g_pagerank" -> (GraphQueries.pageRank _),
    "g_bfs_landmarks" -> (GraphQueries.bfsLandmarks _),
    "g_closeness" -> (GraphQueries.closeness _),
    "g_diameter" -> (GraphQueries.diameter _),
    "g_betweenness" -> (GraphQueries.betweenness _),
    "g_community_sample" -> (GraphQueries.communitySample _),
    "d_exact_dedup" -> (Dedup.exactDedup _),
    "d_minhash_lsh_dups" -> ((s, d) =>
      Dedup.cachedMinhashPairs(d, Tables(s, d).documents, threshold = 0.8)
        .filter(org.apache.spark.sql.functions.col("est_jaccard") >= 0.9)
        .orderBy("a", "b")),
    "d_simhash_dups" -> ((s, d) =>
      Dedup.simhashDupPairs(Tables(s, d).documents, maxHamming = 8)
        .orderBy("a", "b")),
    "d_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables(s, d).documents, cacheKey = Some(d))
        .orderBy("a", "b")),
    // sim column dropped for the oracle: engines agree on the exact
    // neighbor ranking but differ ~1e-6 in the cosine value itself
    "e_knn_brute" -> ((s, d) =>
      Ann.knnBrute(s, d).select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")),
    "e_knn_ivf" -> ((s, d) =>
      Ann.knnIvf(s, d).orderBy("query_id", "rank")),
    "d_embedding_neardup" -> ((s, d) =>
      Ann.embeddingNearDups(s, d).orderBy("a", "b")),
    "q_events_sessions" -> (Relational.qEventsSessions _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q_rollup_revenue" -> (Relational.qRollupRevenue _),
    "q_value_percentiles" -> (Relational.qValuePercentiles _),
    "q_customers_no_orders" -> (Relational.qCustomersNoOrders _),
    "g_weighted_degree" -> (GraphQueries.weightedDegree _),
    "d_token_count" -> (TextAnalysis.tokenCounts _),
    "d_quality_score" -> (TextAnalysis.qualityScores _),
    "d_lang_id" -> (TextAnalysis.langId _),
    "d_fingerprint" -> (TextAnalysis.fingerprints _),
    "d_top_tokens" -> ((s, d) => TextAnalysis.topTokens(s, d)),
    "m_multimodal_meta" -> (Multimodal.multimodalMeta _),
    "g_density" -> (GraphQueries.density _),
    "g_assortativity" -> (GraphQueries.assortativity _),
    "g_neighbor_jaccard" -> (GraphQueries.neighborJaccard _),
    "g_kcore" -> (GraphQueries.kCore _),
    "g_modularity" -> (GraphQueries.modularity _),
    "g_component_sizes" -> (GraphQueries.componentSizes _),
    "g_personalized_pagerank" -> (GraphQueries.personalizedPageRank _),
    "g_avg_path_length" -> (GraphQueries.avgPathLength _),
    "g_eccentricity" -> (GraphQueries.eccentricity _),
    "q_approx_distinct_users" -> (Relational.qApproxDistinctUsers _),
  )

  /** Shared oracle CTE: canonical co-purchase edge list + degree +
    * id-ordered triangle enumeration (each triangle a<b<c once). The
    * Spark side enumerates via degree-ordered orientation instead —
    * different traversal, identical counts. */
  private val GraphCte: String =
    """WITH e AS (
      |  SELECT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |  WHERE a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2),
      |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
      |deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY 1),
      |tri AS (
      |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      |  FROM e e1 JOIN e e2 ON e1.dst = e2.src
      |  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
      |tv AS (
      |  SELECT v AS id, count(*) AS triangles FROM (
      |    SELECT a AS v FROM tri UNION ALL
      |    SELECT b AS v FROM tri UNION ALL
      |    SELECT c AS v FROM tri)
      |  GROUP BY 1),
      |tvd AS (
      |  SELECT d.id, d.degree, coalesce(t.triangles, 0) AS triangles
      |  FROM deg d LEFT JOIN tv t USING (id))
      |""".stripMargin

  /** DuckDB-runnable oracle SQL, column names aligned with the Spark side. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_mktseg_window" ->
      """SELECT c_mktsegment, rank_in_seg, c_custkey, c_name FROM (
        |  SELECT c_mktsegment, c_custkey, c_name,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey ASC)
        |      AS rank_in_seg
        |  FROM customer)
        |WHERE rank_in_seg <= 3
        |ORDER BY c_mktsegment, rank_in_seg""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "g_edges" -> (GraphCte +
      "SELECT src, dst FROM e ORDER BY src, dst"),
    "g_degree" -> (GraphCte +
      "SELECT id, degree FROM deg ORDER BY id"),
    "g_degree_histogram" -> (GraphCte +
      """SELECT degree, count(*) AS n_vertices FROM deg
        |GROUP BY degree ORDER BY degree""".stripMargin),
    "g_avg_degree" -> (GraphCte +
      "SELECT round(avg(degree), 4) AS avg_degree FROM deg"),
    "g_triangles" -> (GraphCte +
      "SELECT id, triangles FROM tvd ORDER BY id"),
    "g_clustering_coeff" -> (GraphCte +
      """SELECT id, degree, triangles,
        |  round(CASE WHEN degree >= 2
        |    THEN 2.0 * triangles / (degree * (degree - 1))
        |    ELSE 0.0 END, 6) AS clustering_coeff
        |FROM tvd ORDER BY id""".stripMargin),
    "g_avg_clustering" -> (GraphCte +
      """SELECT round(avg(CASE WHEN degree >= 2
        |  THEN 2.0 * triangles / (degree * (degree - 1))
        |  ELSE 0.0 END), 6) AS avg_clustering FROM tvd""".stripMargin),
    "g_transitivity" -> (GraphCte +
      """SELECT round(3.0 * (SELECT sum(triangles) / 3.0 FROM tvd)
        |  / (SELECT sum(degree * (degree - 1) / 2) FROM deg), 6)
        |  AS transitivity""".stripMargin),
    "g_induced_subgraph" -> (GraphCte +
      """SELECT src, dst FROM e
        |WHERE src IN (SELECT p_partkey FROM part WHERE p_size <= 10)
        |  AND dst IN (SELECT p_partkey FROM part WHERE p_size <= 10)
        |ORDER BY src, dst""".stripMargin),
    "e_knn_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb
        |  FROM embeddings WHERE vec_id < 20),
        |s AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.q_emb, e.embedding) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM s)
        |SELECT query_id, rank, neighbor_id
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "g_bfs_landmarks" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2),
        |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY 1),
        |lm AS (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 4),
        |bfs(landmark, v, dist) AS (
        |  SELECT id, id, 0 FROM lm
        |  UNION
        |  SELECT b.landmark, s.dst, b.dist + 1
        |  FROM bfs b JOIN sym s ON s.src = b.v WHERE b.dist < 25)
        |SELECT landmark, v, min(dist) AS dist FROM bfs
        |GROUP BY landmark, v ORDER BY landmark, v""".stripMargin,
    "g_closeness" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2),
        |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY 1),
        |lm AS (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 8),
        |bfs(landmark, v, dist) AS (
        |  SELECT id, id, 0 FROM lm
        |  UNION
        |  SELECT b.landmark, s.dst, b.dist + 1
        |  FROM bfs b JOIN sym s ON s.src = b.v WHERE b.dist < 25),
        |md AS (
        |  SELECT landmark, v, min(dist) AS dist FROM bfs GROUP BY 1, 2)
        |SELECT v AS id, round(count(*) / CAST(sum(dist) AS DOUBLE), 6)
        |  AS closeness
        |FROM md WHERE dist > 0 GROUP BY v ORDER BY id""".stripMargin,
    "g_avg_path_length" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2),
        |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY 1),
        |lm AS (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 8),
        |bfs(landmark, v, dist) AS (
        |  SELECT id, id, 0 FROM lm
        |  UNION
        |  SELECT b.landmark, s.dst, b.dist + 1
        |  FROM bfs b JOIN sym s ON s.src = b.v WHERE b.dist < 25),
        |md AS (
        |  SELECT landmark, v, min(dist) AS dist FROM bfs GROUP BY 1, 2)
        |SELECT round(avg(dist), 4) AS avg_path_length
        |FROM md WHERE dist > 0""".stripMargin,
    "g_density" -> (GraphCte +
      """SELECT round(2.0 * (SELECT count(*) FROM e)
        |  / ((SELECT count(*) FROM deg) * ((SELECT count(*) FROM deg) - 1)), 8)
        |  AS density""".stripMargin),
    "g_assortativity" -> (GraphCte +
      """SELECT round(corr(d1.degree, d2.degree), 4) AS assortativity
        |FROM sym JOIN deg d1 ON sym.src = d1.id
        |         JOIN deg d2 ON sym.dst = d2.id""".stripMargin),
    "g_neighbor_jaccard" -> (GraphCte +
      """, cn AS (
        |  SELECT e.src, e.dst, count(*) AS common
        |  FROM e
        |  JOIN sym s1 ON s1.src = e.src
        |  JOIN sym s2 ON s2.src = e.dst AND s2.dst = s1.dst
        |  GROUP BY e.src, e.dst)
        |SELECT e.src, e.dst, coalesce(cn.common, 0) AS common,
        |  round(coalesce(cn.common, 0)
        |    / (d1.degree + d2.degree - coalesce(cn.common, 0)), 6) AS jaccard
        |FROM e
        |LEFT JOIN cn ON e.src = cn.src AND e.dst = cn.dst
        |JOIN deg d1 ON e.src = d1.id
        |JOIN deg d2 ON e.dst = d2.id
        |ORDER BY e.src, e.dst""".stripMargin),
    "d_exact_dedup" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "g_weighted_degree" ->
      """WITH we AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS weight
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2)
        |SELECT id, sum(weight) AS strength FROM (
        |  SELECT src AS id, weight FROM we
        |  UNION ALL SELECT dst AS id, weight FROM we)
        |GROUP BY id ORDER BY id""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name,
        |  coalesce(n_name, 'ALL') AS n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name, n_name""".stripMargin,
    "q_value_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_customers_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "d_top_tokens" ->
      """SELECT token, count(*) AS doc_freq FROM (
        |  SELECT DISTINCT doc_id, unnest(string_split_regex(text, '\s+'))
        |    AS token
        |  FROM documents)
        |GROUP BY token
        |ORDER BY doc_freq DESC, token ASC
        |LIMIT 25""".stripMargin,
    "q_events_sessions" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, sid, min(epoch_ms(ts)) AS session_start_ms,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM y GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,
    "d_token_count" ->
      """SELECT doc_id, length(text) AS n_chars,
        |  len(string_split_regex(text, '\s+')) AS n_tokens,
        |  len(list_distinct(string_split_regex(text, '\s+')))
        |    AS n_distinct_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |    AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_quality_score" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    length(text)::DOUBLE AS n_chars,
        |    (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))::DOUBLE AS n_alpha,
        |    (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))::DOUBLE AS n_upper,
        |    len(string_split_regex(text, '\s+'))::DOUBLE AS n_tokens,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x IN ('the','a','of','and','to','in')))::DOUBLE AS n_stop
        |  FROM documents)
        |SELECT doc_id,
        |  round(n_alpha / n_chars, 4) AS alpha_ratio,
        |  round(n_upper / n_chars, 4) AS upper_ratio,
        |  round(n_stop / n_tokens, 4) AS stopword_ratio,
        |  round((n_chars - n_tokens + 1) / n_tokens, 4) AS mean_word_len,
        |  round(least(n_tokens / 64.0, 1.0) * 0.5
        |    + (n_alpha / n_chars) * 0.3
        |    + least((n_stop / n_tokens) * 5.0, 1.0) * 0.2, 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}
