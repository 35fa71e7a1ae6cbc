package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query suite — the declarative core the graph and pipeline
  * operators compose on. Each query is written plan-first: filters and
  * projections sit directly on the scans (pushdown), dimension tables go
  * through [[broadcast]], aggregates are partial-aggregate friendly.
  *
  * Float aggregates are rounded on BOTH the Spark and the DuckDB oracle
  * side so summation order (which differs between engines and between
  * partitionings) cannot flip the hash compare.
  */
object Relational {

  /** TPC-H Q1 shape: wide scan-aggregate with computed measures.
    * One shuffle on the (tiny) group key; everything else map-side. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3 shape: fact-fact join + agg + deterministic top-k.
    * customer is broadcast; orders⋈lineitem shuffles on orderkey. */
  def q3TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5 shape: star join over all dims. region/nation/supplier are
    * broadcast; the lineitem⋈orders backbone shuffles once on orderkey. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("r_name", "n_name")
  }

  /** Window-function shape: top-3 customers by account balance per market
    * segment. One shuffle on the partition key; rank is computed inside
    * whole-stage codegen. */
  def qMktsegWindow(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t.customer
      .withColumn("rank_in_seg", row_number().over(w))
      .filter(col("rank_in_seg") <= 3)
      .select("c_mktsegment", "rank_in_seg", "c_custkey", "c_name")
      .orderBy("c_mktsegment", "rank_in_seg")
  }

  /** Event-time tumbling window aggregation — the batch twin of the
    * Structured Streaming path (streaming/EventStreams.scala). Windowing
    * is a pure projection (date_trunc); single shuffle on (hour, type). */
  def qEventsHourly(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("hour", date_trunc("hour", col("ts")))
      .groupBy("hour", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        countDistinct("user_id").as("n_users"))
      .orderBy("hour", "event_type")
  }

  /** ROLLUP grouping-sets: revenue by region/nation with subtotals.
    * Subtotal keys are coalesced to 'ALL' so the output is null-free
    * and deterministic across engines. */
  def qRollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("rn"), col("n_name").as("nn"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .createOrReplaceTempView("rollup_src")
    // the SQL path sidesteps DetectAmbiguousSelfJoin, which flags the
    // Dataset rollup API's regenerated (nullable) grouping attributes
    spark.sql(
      """SELECT coalesce(rn, 'ALL') AS r_name, coalesce(nn, 'ALL') AS n_name,
        |  round(sum(rev), 2) AS revenue
        |FROM rollup_src
        |GROUP BY ROLLUP (rn, nn)
        |ORDER BY r_name, n_name""".stripMargin)
  }

  /** Exact percentiles of the event value distribution per event type —
    * order statistics shape (sort-based aggregate). */
  def qValuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")

  /** Sketch quantiles: approx_percentile (Greenwald–Khanna) per event
    * type — at 100 TB the exact `percentile` sorts every group value;
    * the GK sketch is fixed-size per group and merges map-side, the
    * same scale argument as the HLL sketch. Hash-matchable by the
    * same tolerance-flag move as [[qApproxDistinctUsers]]: the
    * engine-specific sketch estimate is checked DISTRIBUTEDLY against
    * the exact rank bound (accuracy 10⁴ ⇒ rank error ≤ n·10⁻⁴;
    * checking |approx−exact| against the value spread of the
    * neighboring exact quantiles would re-derive the sketch, so the
    * flag asserts the estimate sits between the exact p40 and p60 —
    * a ±10-percentile envelope ≫ the sketch's guarantee). The oracle
    * asserts TRUE, so a drifting sketch hash-mismatches every round. */
  def qApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("exact_p50"),
        expr("approx_percentile(value, 0.5, 10000)").as("approx"),
        round(expr("percentile(value, 0.40)"), 4).as("lo"),
        round(expr("percentile(value, 0.60)"), 4).as("hi"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("exact_p50"), col("n_events"),
        (col("approx") >= col("lo") && col("approx") <= col("hi"))
          .as("within_tolerance"))
      .orderBy("event_type")

  /** Hourly volume anomalies per event type: hours whose event count
    * sits more than 2σ from the type's hourly mean — the monitoring
    * query every event pipeline runs. Two map-side-combined
    * aggregates (hourly counts, then per-type moments) + a broadcast
    * of the |types|-row stats; z is computed from exact integer
    * moments (Σn, Σn² as longs) in an operation order the oracle
    * mirrors token-for-token, so the 2σ boundary cannot drift
    * between engines. */
  def qEventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(spark, dir).events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("h"), sum("n").as("s"),
        sum(col("n") * col("n")).as("sq"))
    val mean = col("s") / col("h").cast("double")
    val z = (col("n") - mean) /
      sqrt(col("sq") / col("h").cast("double") - mean * mean)
    hourly.join(broadcast(stats), "event_type")
      .filter(abs(z) > 2.0)
      .select(col("event_type"), col("hour"), col("n").as("n_events"),
        round(z, 4).as("z"))
      .orderBy("event_type", "hour")
  }

  /** Anti-join shape (NOT EXISTS): customers with no large orders
    * (total price above 450k) — non-empty at every scale factor. */
  def qCustomersNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bigOrders = t.orders.filter(col("o_totalprice") > 450000.0)
    t.customer
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Sketch aggregation: approximate distinct users per event type via
    * HyperLogLog++. At 100 TB exact countDistinct shuffles every
    * distinct value; the sketch is fixed-size per group and merges
    * map-side — this is THE scale pattern for cardinality.
    *
    * Output shape is hash-matchable by a plain oracle: the raw HLL
    * estimate is engine-specific, so instead of emitting it we emit
    * the exact count plus `within_tolerance` — the estimate checked
    * against the exact count DISTRIBUTEDLY (|approx−exact| ≤
    * max(10, 5%·exact); rsd=0.01 makes 5% a ≥5σ envelope). The oracle
    * asserts TRUE: if the sketch ever drifts out of tolerance the
    * hash mismatches, so the sketch itself stays gated every round.
    * The exact column exists for the gate; the sketch remains the
    * operator under test and the 100 TB pattern.
    *
    * Plan shape: the exact count is TWO-PHASE — pre-aggregate
    * (event_type, user_id) with map-side combine, then count the
    * distinct rows. Mixing countDistinct with plain aggregates in one
    * groupBy makes Spark Expand every input row into two streams
    * (2× scan width through both aggregate passes — measured ~3× this
    * plan at sf0.1); the pre-distinct shuffle carries only the
    * distinct pairs, and the HLL sketch rides the distinct set
    * unchanged (HLL is duplicate-insensitive by construction). */
  def qApproxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("exact_users"),
        approx_count_distinct("user_id", rsd = 0.01).as("approx"),
        sum("n").as("n_events"))
      .select(col("event_type"), col("exact_users"), col("n_events"),
        (abs(col("approx") - col("exact_users")) <=
          greatest(lit(10.0), col("exact_users") * lit(0.05)))
          .as("within_tolerance"))
      .orderBy("event_type")

  /** TPC-H Q6 shape: pure filter-aggregate — the predicate-pushdown
    * showcase (filters reach the parquet scan; zero joins, one scalar). */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  /** Gaps-and-islands sessionization (batch twin of
    * streaming/EventStreams.sessionize): a session breaks after a
    * 30-minute silence. Window algebra — one shuffle on user_id. */
  def qEventsSessions(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapMs = 30 * 60 * 1000L
    t.events
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("new_s",
        when(lag("ms", 1).over(w).isNull ||
          col("ms") - lag("ms", 1).over(w) > gapMs, 1).otherwise(0))
      .withColumn("sid", sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("ms").as("session_start_ms"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "sid")
  }

  /** PIVOT / crosstab shape: revenue by nation (rows) × order priority
    * (columns) through Spark's native `pivot` with an EXPLICIT value
    * list — pivoting on discovered values would need an extra pass AND
    * make the output schema data-dependent (a 100 TB anti-pattern;
    * with fixed values the pivot is one pass, map-side combined, and
    * the plan is identical to five conditional sums). */
  def qPivotRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pr = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val alias = Map("1-URGENT" -> "p_urgent", "2-HIGH" -> "p_high",
      "3-MEDIUM" -> "p_medium", "4-NOT SPECIFIED" -> "p_not_specified",
      "5-LOW" -> "p_low")
    val joined = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderpriority"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val pivoted = joined.groupBy("n_name")
      .pivot("o_orderpriority", pr)
      .agg(round(sum("rev"), 2))
    pr.foldLeft(pivoted)((df, p) => df.withColumnRenamed(p, alias(p)))
      .na.fill(0.0, alias.values.toSeq)
      .orderBy("n_name")
  }

  /** As-of join (event attribution): every purchase matched to the
    * user's most recent view at-or-before it — the canonical time-series
    * join (market data, attribution, slowly-changing dims). DuckDB runs
    * its native ASOF JOIN as the oracle; Spark has no asof operator, so
    * this is the UNION + ordered-window form — the scalable shape:
    * both sides union into one stream, ONE shuffle on the join key,
    * and `last(view_ts) ignoring nulls` over the time-ordered window
    * resolves the match without a range self-join (a naive
    * per-row max-subquery ships |purchases|·|views| pairs; this ships
    * each row once). At equal timestamps the view orders BEFORE the
    * purchase (≤ semantics), event_id completes the total order. */
  def qAsofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ms"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("event_type").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.withColumn("last_view_ms",
        last(when(col("event_type") === "view", col("ms")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ms").as("purchase_ms"),
        col("last_view_ms"),
        (col("ms") - col("last_view_ms")).as("gap_ms"))
      .orderBy("event_id")
  }

  /** Range (interval) join: for every error event, how many clicks the
    * same user made within ±5 minutes — the time-proximity join shape
    * (incident correlation, feature windows). A naive formulation is an
    * inequality join — |errors|·|clicks| pairs per user before
    * filtering. The scalable form BUCKETIZES time: every click lands in
    * exactly one 5-minute bucket, every error probes its own bucket ±1,
    * so the join is a plain equi-join on (user, bucket) — each
    * candidate pair produced exactly once (a click has one bucket) —
    * followed by the exact |Δt| ≤ 5 min filter. Candidates per error
    * are bounded by the user's clicks in 3 buckets, never the whole
    * history. The DuckDB oracle runs the straight inequality join. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val winMs = 300000L
    val ev = Tables(spark, dir).events
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("error_ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_millis(col("ts")).as("click_ms"))
      .withColumn("bucket", expr(s"click_ms DIV $winMs"))
    val probes = errors
      .withColumn("b0", expr(s"error_ms DIV $winMs"))
      .withColumn("bucket", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
    val counts = probes.join(clicks, Seq("user_id", "bucket"))
      .filter(abs(col("click_ms") - col("error_ms")) <= winMs)
      .groupBy("user_id", "event_id")
      .agg(count(lit(1)).as("n_nearby_clicks"))
    errors.join(counts, Seq("user_id", "event_id"), "left")
      .na.fill(0L, Seq("n_nearby_clicks"))
      .select("user_id", "event_id", "error_ms", "n_nearby_clicks")
      .orderBy("event_id")
  }

  /** Correlated aggregate subquery (TPC-H Q17 shape): revenue from
    * lineitems whose quantity is below 20% of their part's average —
    * the decorrelation pattern. Expressed as an explicit per-part
    * aggregate + self-join (exactly what Catalyst decorrelates a
    * correlated scalar subquery into): one map-side-combined groupBy on
    * partkey, one co-keyed join — never a per-row subquery execution. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val avgQty = li.groupBy(col("l_partkey").as("p_key"))
      .agg((avg("l_quantity") * 0.2).as("qty_cut"))
    li.join(avgQty, col("l_partkey") === col("p_key"))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
  }

  /** TPC-H Q18 shape (large-quantity orders): HAVING on a fact
    * aggregate, then semi-joined back onto the fact⋈dim chain. The
    * qualifying-keys set is aggregated FIRST (map-side combinable sum,
    * one shuffle on orderkey) and drives semi/inner joins — no
    * IN-subquery rewrite, no second scan of lineitem post-filter.
    * Threshold 150 picks a small top set at every SF. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bigOrders = t.lineitem.groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 150)
    t.orders
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), round(col("o_totalprice"), 2).as("o_total"),
        round(col("total_qty"), 2).as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
      .limit(20)
  }

  /** Running-total window frame: cumulative order value per customer in
    * order-date order (rows unbounded-preceding..current). The window
    * partitions by customer — thousands of independent partitions, no
    * global sort; ties broken by orderkey for a deterministic frame. */
  def qRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.orders
      .filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** TPC-H Q7 shape (volume shipping): bilateral trade revenue between
    * two nations by ship year. The nation filter is applied to the DIM
    * tables BEFORE the fact joins — supplier and customer each shrink to
    * the two nations of interest, so the lineitem⋈orders backbone probes
    * two broadcast dims instead of filtering post-join; the disjunctive
    * (n1,n2)/(n2,n1) pair predicate runs on the two tiny joined columns. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val (n1, n2) = ("NATION_18", "NATION_19")
    val nations = t.nation.filter(col("n_name").isin(n1, n2))
    val supp = t.supplier
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t.customer
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape (national market share): the share of one nation's
    * suppliers in one region's customer market per order year — the
    * conditional-fraction aggregate (sum(case)/sum). Region restriction
    * prunes customers via two broadcast hops; both sums come out of ONE
    * map-side-combined pass. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val target = "NATION_3"
    val regionCust = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val supp = t.supplier
      .join(broadcast(t.nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(regionCust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"),
        col("supp_nation"))
      .groupBy("o_year")
      .agg(round(
        sum(when(col("supp_nation") === target, col("rev")).otherwise(0.0))
          / sum(col("rev")), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q14 shape (promotion effect): promo revenue share per ship
    * month — conditional aggregate over a broadcast part join; one
    * map-side-combined pass, monthly grain for a non-trivial row count. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val parts = t.part.select(col("p_partkey"), col("p_type"))
    t.lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(date_trunc("month", col("l_shipdate")).as("ship_month"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"),
        col("p_type"))
      .groupBy("ship_month")
      .agg(
        round(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0.0)), 2)
          .as("promo_revenue"),
        round(sum(col("rev")), 2).as("total_revenue"),
        round(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0.0))
          * 100.0 / sum(col("rev")), 4).as("promo_pct"))
      .orderBy("ship_month")
  }

  /** TPC-H Q2 shape (min-per-group + join back): for each small part,
    * the supplier selling it at the lowest average price. The per-group
    * argmin is a MIN-STRUCT aggregate (price, then suppkey as the
    * deterministic tie-break) — one map-side-combined pass, no window,
    * no sort; the 4-dp rounding pins the float average so the argmin
    * cannot flip with summation order across engines. */
  def q2MinPriceSupplier(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val sp = t.lineitem.groupBy("l_partkey", "l_suppkey")
      .agg(round(avg("l_extendedprice"), 4).as("avg_price"))
    val best = sp.groupBy(col("l_partkey").as("p_key"))
      .agg(min(struct(col("avg_price"), col("l_suppkey"))).as("b"))
      .select(col("p_key"), col("b.l_suppkey").as("s_suppkey"),
        col("b.avg_price").as("best_price"))
    best
      .join(broadcast(t.part.filter(col("p_size") <= 3)),
        col("p_key") === col("p_partkey"))
      .join(broadcast(t.supplier), "s_suppkey")
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("best_price"))
      .orderBy("p_partkey")
  }

  /** Funnel analysis (view → click → purchase, strictly ordered in
    * event time per user): each stage joins the previous stage's
    * first-completion time back onto the event stream and takes the
    * min qualifying timestamp — three user-keyed aggregates/joins, no
    * window over the whole stream, no per-user event collection. */
  def qEventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ms").as("v_ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id").filter(col("ms") > col("v_ms"))
      .groupBy("user_id").agg(min("ms").as("c_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id").filter(col("ms") > col("c_ms"))
      .groupBy("user_id").agg(min("ms").as("p_ms"))
    views.agg(count(lit(1)).as("n_viewed"))
      .crossJoin(clicks.agg(count(lit(1)).as("n_clicked_after_view")))
      .crossJoin(purchases.agg(count(lit(1)).as("n_purchased_after_click")))
  }

  /** Cohort retention (the classic product-analytics query): users
    * grouped by first-active DAY, counted on each later day they remain
    * active (the event table spans one month, so daily grain gives the
    * full retention triangle). Two user-keyed aggregates (first-seen,
    * distinct active days) and one tiny groupBy — no self-join of the
    * event stream against itself. */
  def qCohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), date_trunc("day", col("ts")).as("ad"))
    val first = ev.groupBy("user_id").agg(min("ad").as("cohort"))
    ev.distinct()
      .join(first, "user_id")
      .select(col("cohort"),
        datediff(col("ad"), col("cohort")).cast("long").as("days_since"))
      .groupBy("cohort", "days_since")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "days_since")
  }

  /** Semi-join shape (correlated EXISTS): order-priority counts for
    * orders with at least one lineitem shipped after the order date —
    * equi-key plus a non-equi residual condition. The semi-join keeps
    * the probe side deduplicated without a distinct. */
  def qOrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val shipped = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
    t.orders
      .join(shipped, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** CUBE grouping-sets shape: revenue over every subset of
    * {returnflag, linestatus} in ONE map-side-combined pass (4 grouping
    * sets; the ROLLUP twin is [[qRollupRevenue]]). Null-free subtotal
    * labels via grouping(), same as the rollup query. */
  /** Inter-arrival statistics per event type: mean gap and coefficient
    * of variation of the per-(user, type) event gaps — CV ≈ 1 is the
    * Poisson/exponential signature, CV >> 1 burstiness (Barabási's
    * human-dynamics test). Gaps are whole seconds (exact longs); mean
    * and CV come from the exact (n, Σg, Σg²) moments in one map-side-
    * combined aggregate, each a single rounded division — no float
    * ever enters a distributed sum. */
  def qInterarrival(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val deltaMs = unix_millis(col("ts")) -
      lag(unix_millis(col("ts")), 1).over(w)
    Tables(spark, dir).events
      .select(col("event_type"), deltaMs.as("delta_ms"))
      .filter(col("delta_ms").isNotNull)
      .select(col("event_type"), expr("delta_ms div 1000").as("gap"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), sum("gap").as("sg"),
        sum(col("gap") * col("gap")).as("sg2"))
      .select(col("event_type"), col("n_gaps"),
        round(col("sg") / (col("n_gaps") * 1.0), 4).as("mean_gap_s"),
        // moments to DOUBLE before multiplying: n·Σg² and (Σg)² pass
        // 2⁶³ at sf0.1 as longs (ANSI overflow). The doubles round
        // identically on both engines (same IEEE op sequence), and a
        // 1-ulp variance error is invisible at 4 dp; greatest(,0)
        // guards the zero-variance rounding corner.
        round(sqrt(greatest(
          col("n_gaps").cast("double") * col("sg2") -
            col("sg").cast("double") * col("sg"), lit(0.0))) /
          col("sg"), 4).as("cv_gap"))
      .orderBy("event_type")
  }

  /** Misra–Gries heavy hitters over lineitem part frequencies — the
    * third classic sketch next to HLL (q_approx_distinct_users) and GK
    * (q_approx_percentiles). Per-partition MG summaries (`counters`
    * slots, the genuine per-partition imperative case → mapPartitions)
    * merge associatively via treeReduce with truncation to the top
    * `counters` (Agarwal et al., mergeable summaries); `dec` tracks
    * every decrement unit, giving the sound deterministic bound
    * est(x) ≤ exact(x) ≤ est(x) + dec for EVERY item regardless of
    * partitioning. The emitted shape is the driver-gatable one (the
    * approx-sketch convention): exact top-k + a within_bound flag the
    * theorem forces TRUE — a buggy sketch hash-mismatches. At 100 TB
    * the summary is counters-sized per partition and the merge is a
    * log-depth tree; the exact side is one map-side-combined count. */
  /** Distributed mergeable MG sketch: per-partition summaries +
    * truncating treeReduce. Returns (estimates, decrement units);
    * soundness: est(x) ≤ exact(x) ≤ est(x) + dec for every item. */
  /** Associative MG summary merge with truncation to `counters` slots
    * (Agarwal et al., mergeable summaries) — shared by the batch
    * sketch below and the streaming per-micro-batch fold
    * (streaming.StreamingHeavyHitters). */
  private[graft] def mgMerge(a: (Map[Long, Long], Long),
                             b: (Map[Long, Long], Long),
                             counters: Int): (Map[Long, Long], Long) = {
    def truncate(m: Map[Long, Long], dec: Long): (Map[Long, Long], Long) =
      if (m.size <= counters) (m, dec)
      else {
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(counters)
        val kept = m.flatMap { case (x, c) =>
          if (c - cut > 0) Some(x -> (c - cut)) else None }
        (kept, dec + cut)
      }
    val merged = (a._1.keySet ++ b._1.keySet).map(x =>
      x -> (a._1.getOrElse(x, 0L) + b._1.getOrElse(x, 0L))).toMap
    truncate(merged, a._2 + b._2)
  }

  private[graft] def mgSketch(items: org.apache.spark.rdd.RDD[Long],
                              counters: Int): (Map[Long, Long], Long) = {
    type MG = (Map[Long, Long], Long)
    items.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[Long, Long]
      var dec = 0L
      it.foreach { x =>
        if (m.contains(x)) m(x) += 1L
        else if (m.size < counters) m(x) = 1L
        else { // classic MG step: decrement all, drop zeros, skip x
          dec += 1L
          m.keysIterator.toArray.foreach { y =>
            if (m(y) == 1L) m.remove(y) else m(y) -= 1L
          }
        }
      }
      Iterator.single((m.toMap, dec)): Iterator[MG]
    }.treeReduce(mgMerge(_, _, counters))
  }

  def qHeavyHitters(spark: SparkSession, dir: String,
                    k: Int = 10, counters: Int = 64): DataFrame = {
    import spark.implicits._
    val items = Tables(spark, dir).lineitem.select(col("l_partkey"))
      .as[Long].rdd
    val (est, dec) = mgSketch(items, counters)
    // no UDF: the counters-sized summary becomes a broadcast join side
    val estDf = est.toSeq.toDF("item", "est")
    val topk = Tables(spark, dir).lineitem
      .groupBy(col("l_partkey").as("item"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("item").asc).limit(k)
    topk.join(broadcast(estDf), Seq("item"), "left")
      .na.fill(0L, Seq("est"))
      .select(col("item"), col("exact_cnt"),
        (col("est") <= col("exact_cnt") &&
          col("exact_cnt") - col("est") <= lit(dec)).as("within_bound"))
      .orderBy(col("exact_cnt").desc, col("item").asc)
  }

  /** KMV (k-minimum-values / bottom-k) distinct-count sketch over the
    * event user set — the order-statistics member of the sketch family
    * (HLL = bitmap, Count-Min = counters, GK = quantiles, Misra–Gries
    * = frequencies, KMV = minima; Bar-Yossef et al. 2002). Users hash
    * to 60-bit uniform values (first 15 hex chars of md5 — the repo's
    * portable-coin idiom), and the k-th smallest hash estimates
    * D ≈ (k−1)·2⁶⁰ / h_k. The md5 IS the randomness, so the sketch —
    * including the estimate itself — replays bit-for-bit in SQL:
    * (k−1)·2⁶⁰ is exactly representable in double (small odd × power
    * of two) and the final round is at scale 0 (tie-safe).
    *
    * Scale shape: the bottom-k is distinct-hash → TakeOrdered (per-
    * partition top-k, driver merge of k·parts rows — never a global
    * sort); at stream scale the same sketch is a k-slot heap per
    * partition (the TopKByScore shape). The exact side rides one
    * map-side-combined distinct for the driver-gatable compare, like
    * every approx sketch here. */
  def qKmvDistinct(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
    val h = conv(substring(md5(concat(lit("kmv:"), col("user_id"))), 1, 15),
      16, 10).cast("long")
    val bottom = ev.select(h.as("h")).distinct()
      .orderBy("h").limit(k)
      .agg(max("h").as("hk"), count(lit(1)).as("kk")).head()
    // empty-stream guard: max(h) is NULL and exact = 0 — emit the
    // zero sketch instead of an NPE / divide-by-zero
    val kk = bottom.getLong(1)
    val hk = if (kk == 0) 0L else bottom.getLong(0)
    val exact = ev.select("user_id").distinct().count()
    val est =
      if (kk < k) kk // saw fewer than k values: the sketch IS exact
      else math.round((k - 1).toDouble * math.pow(2, 60) / hk.toDouble)
    val errPer10k =
      if (exact == 0) 0L
      else math.round(math.abs(est - exact) * 10000.0 / exact)
    Seq((k, hk, est, exact, errPer10k))
      .toDF("k", "kth_min_hash", "est_distinct", "exact_distinct",
        "err_per_10k")
  }

  /** Exponential-decay (half-life) weighted activity per event type:
    * score = Σ value·2^(−age/7d), age measured from the stream's max
    * timestamp — the recency-weighted counter semantics behind
    * trending/engagement scores (a decayed counter needs no window
    * state: it is ONE map-side expression + aggregate at any scale).
    * Each decayed term is 1e-6-quantized to an exact long before the
    * order-free sum, so the float never depends on partition order. */
  def qDecayedActivity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val mx = ev.agg(max(unix_millis(col("ts")))).head().getLong(0)
    val age = (lit(mx) - unix_millis(col("ts"))) / 86400000.0
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(round(col("value") * pow(lit(2.0), -age / 7.0) * 1e6)
          .cast("long")) / 1e6, 4).as("decayed_value"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")
  }

  /** Semi-structured extraction: the events `props` column is a JSON
    * string; parse it ONCE per row with the schema-typed `from_json`
    * (codegen'd Jackson parse into an unsafe struct — no UDF, stays
    * inside whole-stage codegen) and aggregate the extracted field.
    * The scan reads only (event_type, props); the parse is map-side;
    * integer sums are exact. This is the JSON-column pattern a 100 TB
    * event pipeline lives on — parse at the edge of the scan, never
    * carry strings through a shuffle. */
  def qPropsJson(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructType}
    val ev = Tables(spark, dir).events
    val k = from_json(col("props"), new StructType().add("k", LongType))
      .getField("k")
    ev.select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"),
        round(sum("k") / (count(lit(1)) * 1.0), 4).as("avg_k"))
      .orderBy("event_type")
  }

  /** Explicit GROUPING SETS with grouping_id — the third member of the
    * multi-granularity aggregation family (ROLLUP emits the prefix
    * lattice, CUBE the full lattice; GROUPING SETS picks exactly the
    * granularities wanted). One pass over orders: Spark expands the
    * sets via a single Expand node feeding one hash aggregate — the
    * same shuffle count as a plain GROUP BY, so the multi-granularity
    * report is free of extra passes at any scale. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).orders
      .select(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"),
        col("o_totalprice").as("tp"))
      .createOrReplaceTempView("gs_src")
    // SQL path like qCubeRevenue: grouping()/grouping_id() only bind
    // inside the grouped query
    spark.sql(
      """SELECT
        |  CASE WHEN grouping(pri) = 1 THEN 'ALL' ELSE pri END AS priority,
        |  CASE WHEN grouping(st) = 1 THEN 'ALL' ELSE st END AS status,
        |  cast(grouping_id(pri, st) AS BIGINT) AS gid,
        |  count(*) AS n_orders,
        |  round(sum(tp), 2) AS total_price
        |FROM gs_src
        |GROUP BY GROUPING SETS ((pri), (st), (pri, st), ())
        |ORDER BY gid, priority, status""".stripMargin)
  }

  def qCubeRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).lineitem
      .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .createOrReplaceTempView("cube_src")
    // SQL path for the same reason as qRollupRevenue: grouping() lives
    // inside the GROUP BY CUBE query, not a post-aggregate projection
    spark.sql(
      """SELECT
        |  CASE WHEN grouping(rf) = 1 THEN 'ALL' ELSE rf END AS returnflag,
        |  CASE WHEN grouping(ls) = 1 THEN 'ALL' ELSE ls END AS linestatus,
        |  round(sum(rev), 2) AS revenue, count(*) AS n_rows
        |FROM cube_src
        |GROUP BY CUBE (rf, ls)
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** LAG window shape: quarterly revenue with quarter-over-quarter
    * growth. The lag runs over the ~27-row quarterly AGGREGATE — its
    * single-partition sort never sees row-scale data; both engines
    * compute the ratio over the same rounded inputs so the 4-dp output
    * is stable. */
  def qQoqGrowth(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables(spark, dir).orders
      .groupBy(date_trunc("quarter", col("o_orderdate")).as("quarter"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
    val w = Window.orderBy("quarter")
    q.select(col("quarter"), col("revenue"),
        round(lit(100.0) * (col("revenue") - lag("revenue", 1).over(w)) /
          lag("revenue", 1).over(w), 4).as("qoq_pct"))
      .orderBy("quarter")
  }

  /** TPC-H Q10 shape: returned-item revenue per customer over a date
    * window, deterministic top-20. Both filters sit on the scans
    * (pushdown); customer and nation broadcast into the orders⋈lineitem
    * backbone. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // customer scales with SF — shuffle join on custkey; only the
    // fixed-size nation dim broadcasts
    t.lineitem.filter(col("l_returnflag") === "R")
      .join(t.orders.filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1996-07-01"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q13 shape: order-count distribution over customers — a LEFT
    * join with a residual predicate ON THE JOIN (not a post-filter, so
    * customers with only urgent orders still count as zero), then a
    * two-level aggregate. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders.filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15 shape: quarterly revenue per supplier, then the
    * argmax via a broadcast 1-row max join (the spec's view + scalar
    * subquery). Revenue is rounded BEFORE the max compare on both
    * engines so fp summation order can't flip the winner. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rev = t.lineitem
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1996-04-01")
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("total_revenue"))
    rev.join(broadcast(rev.agg(max("total_revenue").as("mx"))),
        col("total_revenue") === col("mx"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q19 shape: disjunctive brand/size/quantity predicates — one
    * scan each side, the OR-of-ANDs evaluated as the join residual on a
    * broadcast part. */
  def q19DiscountedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // part-only half of the disjunction pushes to the part scan, so
    // only the 3-brand slice broadcasts — full part scales with SF
    val partCond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 35))
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 30))
    t.lineitem
      .join(broadcast(t.part.filter(partCond)),
        col("p_partkey") === col("l_partkey"))
      .filter(cond)
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
  }

  /** TPC-H Q12 shape (adapted — this schema carries no ship mode or
    * commit/receipt dates): lineitems shipped >60 days after the order
    * date, counted and valued per order priority. The non-equi lateness
    * predicate is the join residual. */
  def qLateShipments(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("late_count"),
        round(sum("l_extendedprice"), 2).as("late_value"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q22 shape (adapted — no phone country codes in this schema):
    * above-average-balance customers with no recent orders, per nation.
    * The average compare is exact integer cross-multiplication over
    * cent-quantized balances (c_cents·count > Σcents) — a float
    * threshold would let summation order flip boundary customers
    * between engines. Anti-join replaces NOT EXISTS. */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cents = round(col("c_acctbal") * 100).cast("long")
    val thr = t.customer.filter(col("c_acctbal") > 0)
      .agg(sum(cents).as("tot"), count(lit(1)).as("cnt"))
    t.customer.crossJoin(broadcast(thr))
      .filter(cents * col("cnt") > col("tot"))
      .join(t.orders.filter(col("o_orderdate") >= "2000-01-01")
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        round(sum("c_acctbal"), 2).as("totacctbal"))
      .orderBy("n_name")
  }

  /** TPC-H Q9 shape (product-type profit by nation and year; adapted —
    * this schema has no partsupp, so supply cost is modeled as
    * 0.4·p_retailprice·l_quantity). The 5-way star join resolves as
    * ONE shuffle-free pass over lineitem⋈orders: part and
    * supplier⋈nation are broadcast dims, so only the two fact tables
    * shuffle (on the l_orderkey equi-key AQE picks anyway). Profit
    * sums are cent-exact after the 2-dp round. */
  def q9ProfitByNation(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val parts = t.part.filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), col("p_retailprice"))
    val supp = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    t.lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.4) * col("p_retailprice") * col("l_quantity")).as("amount"))
      .groupBy("nation", "o_year")
      .agg(round(sum("amount"), 2).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape (important stock; adapted — no partsupp, so a
    * part's "value" is the order volume shipped for it): parts whose
    * value exceeds 1.4× the mean part value (≈ the p95 of this
    * generator's near-uniform part-volume distribution). The threshold is
    * SCALE-FREE (a fixed fraction pins the row count to the data
    * size; a mean multiple keeps the same selectivity at any SF) and the
    * compare cross-multiplies exact cent sums (10·cents·n_parts >
    * 14·total) — no float summation boundary can flip a part between
    * engines. The total is a 1-row broadcast. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val vals = t.lineitem
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(round(col("l_extendedprice") * col("l_quantity") * 100)
        .cast("long")).as("cents"))
    val tot = vals.agg(sum("cents").as("tot_cents"),
      count(lit(1)).as("n_parts"))
    vals.crossJoin(broadcast(tot))
      .filter(col("cents") * col("n_parts") * 10 > col("tot_cents") * 14)
      .select(col("p_partkey"), round(col("cents") / 100.0, 2).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** TPC-H Q12 shape (shipping priority vs lateness; adapted — no
    * l_shipmode, so lines group by l_linestatus, and "late" means
    * shipped more than 60 days after the order date): high- vs
    * low-priority line counts per status. One fact-fact equi-join,
    * both conditional counts in ONE map-side-combined pass. */
  def q12ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q16 shape (supplier counts by part attribute; adapted — the
    * part-supplier relation is DERIVED from lineitem, and "complaint"
    * suppliers are those with negative account balance): distinct
    * supplier count per (brand, type, size) for small parts outside
    * one brand. The bridge dedups to distinct (part, supp) pairs
    * BEFORE the attribute join (map-side combine absorbs lineitem
    * fan-in); part attrs broadcast; excluded suppliers anti-join. */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val parts = t.part
      .filter(col("p_size") <= 8 && col("p_brand") =!= "Brand#1")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complaints = t.supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val bridge = t.lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    bridge.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 shape (suppliers with excess movement; adapted — no
    * partsupp availability, so the signal is total 1997 shipped
    * quantity of small-named parts above 1.5× the supplier mean — a
    * SCALE-FREE threshold, same selectivity at any SF): the
    * qualifying supplier keys come out of one part-filtered lineitem
    * aggregate with an exact integer cross-multiplied cut
    * (2·qty·n_supp > 3·total), then a semi-join keeps matching
    * suppliers. Part filter broadcast; one fact scan. */
  def q20ExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val smallParts = t.part.filter(col("p_name").startsWith("small"))
      .select(col("p_partkey"))
    val qty = t.lineitem
      .filter(year(col("l_shipdate")) === 1997)
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))
    val tot = qty.agg(sum("qty_cents").as("tot_cents"),
      count(lit(1)).as("n_supp"))
    val heavy = qty.crossJoin(broadcast(tot))
      .filter(col("qty_cents") * col("n_supp") * 2 > col("tot_cents") * 3)
      .select(col("l_suppkey"))
    t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("n_name").as("nation"))
      .orderBy("s_name")
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting; adapted — no
    * receipt/commit dates, so "waiting" means: in a finished
    * multi-supplier order, THIS supplier alone shipped last, later
    * than 60 days after the order date). The EXISTS / NOT-EXISTS pair
    * of the reference SQL decorrelates into per-order window
    * aggregates — max ship date, its supplier count, distinct
    * supplier count — computed in ONE pass over the order's lines;
    * no self-join of lineitem against itself per predicate. */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("l_orderkey")
    val lines = t.lineitem
      .join(t.orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("o_orderdate"))
      .withColumn("max_ship", max(col("l_shipdate")).over(w))
      .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
      .withColumn("late_supp", size(collect_set(
        when(col("l_shipdate") === col("max_ship"), col("l_suppkey"))).over(w)))
    lines
      .filter(col("n_supp") >= 2 && col("late_supp") === 1 &&
        col("l_shipdate") === col("max_ship") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Event-type transition matrix (first-order Markov chain over each
    * user's event sequence): count + row-normalized probability per
    * (from, to). The sequence order is (ts, event_id) — the same
    * deterministic tie-break as sessionization. One window pass + one
    * tiny groupBy; the row normalization is a types²-sized window, not
    * a second data pass. */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables(spark, dir).events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") /
        sum("n").over(Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  /** Market-basket lift for co-purchased part pairs:
    * lift(a,b) = P(a,b) / (P(a)·P(b)) = w·N / (cₐ·c_b) over the
    * distinct (order, part) incidence — the association-rule strength
    * behind "frequently bought together". All counts are exact longs
    * (ONE double division at the end, engine-portable); the order
    * total is a 1-row crossJoin. Support floor w ≥ 3 is scale-free;
    * top 20 by (lift, src, dst) is a deterministic bounded sort. */
  def qBasketLift(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val partCnt = op.groupBy("pk").agg(count(lit(1)).as("c"))
    val tot = op.agg(countDistinct("ok").as("n_orders"))
    op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 3)
      .join(partCnt.select(col("pk").as("src"), col("c").as("c_src")), "src")
      .join(partCnt.select(col("pk").as("dst"), col("c").as("c_dst")), "dst")
      .crossJoin(tot)
      .select(col("src"), col("dst"), col("w"), col("c_src"), col("c_dst"),
        round(col("w") * col("n_orders") / (col("c_src") * col("c_dst")), 6)
          .as("lift"))
      .orderBy(col("lift").desc, col("src"), col("dst"))
      .limit(20)
  }

  /** Count-Min sketch point estimates for the top part frequencies —
    * the fourth classic sketch next to HLL (approx distinct), GK
    * (approx percentiles) and Misra–Gries (heavy hitters). The sketch
    * here is DECLARED, not hand-sketched: a d×w counter table IS a
    * groupBy over (row, md5-bucket), commutative sums make it a
    * deterministic function of the multiset regardless of
    * partitioning, so the oracle replays the ENTIRE sketch exactly —
    * a stronger gate than a tolerance flag. est(x) = min over rows of
    * the bucketed counters; the theorem est ≥ exact is visible in the
    * output pair. One corpus pass for the counters (map-side partial
    * agg into d·w cells), one for the exact top-k; the probe side is
    * k·d rows joined against the broadcast counter table. */
  def qCountMin(spark: SparkSession, dir: String, depth: Int = 4,
                width: Int = 256, k: Int = 10): DataFrame = {
    val items = Tables(spark, dir).lineitem.select(col("l_partkey").as("item"))
    def bucket(i: Int): org.apache.spark.sql.Column =
      conv(substring(md5(concat_ws(":", lit("cms"), lit(i), col("item"))),
        1, 7), 16, 10).cast("long") % width
    val counters = items
      .select(posexplode(array((0 until depth).map(bucket): _*))
        .as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
    val top = items.groupBy("item").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("item")).limit(k)
    top
      .select(col("item"), col("exact_cnt"),
        posexplode(array((0 until depth).map(bucket): _*)).as(Seq("r", "b")))
      .join(broadcast(counters), Seq("r", "b"))
      .groupBy("item", "exact_cnt").agg(min("cnt").as("cms_est"))
      .orderBy(col("exact_cnt").desc, col("item"))
  }

  /** Pearson correlation matrix over lineitem's numeric measures
    * (quantity, extendedprice, discount), per return flag — the
    * feature-correlation screen a column-pruning / feature-selection
    * pass runs before training. Engine-portable by the micro-int
    * discipline: inputs are quantized to exact integer units
    * (quantity and price to 1, discount to 1e-4), ALL power sums are
    * exact DECIMAL(38,0)/HUGEINT integers (Σx² ≤ n·1.3e10 — decimal38
    * holds to n ~ 1e27 rows), and the final r is ONE identical IEEE
    * double expression on both engines, rounded to 6 dp. The pair
    * explosion triples the scanned rows but keeps the plan a single
    * map-side-combined groupBy on a 9-key space — at 100 TB this is
    * one pass over the fact table, no joins, 9 result rows. */
  def qCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem.select(
      col("l_returnflag"),
      round(col("l_quantity")).cast("long").as("q"),
      round(col("l_extendedprice")).cast("long").as("e"),
      round(col("l_discount") * 1e4).cast("long").as("d"))
    val pairs = li.select(col("l_returnflag"), explode(array(
        struct(lit("qty_price").as("pair"), col("q").as("x"), col("e").as("y")),
        struct(lit("qty_disc").as("pair"), col("q").as("x"), col("d").as("y")),
        struct(lit("price_disc").as("pair"), col("e").as("x"), col("d").as("y"))
      )).as("p"))
      .select(col("l_returnflag"), col("p.pair").as("pair"),
        col("p.x").as("x"), col("p.y").as("y"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    pairs.groupBy("l_returnflag", "pair")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
      .select(col("l_returnflag"), col("pair"), col("n"),
        round((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("corr"))
      .orderBy("l_returnflag", "pair")
  }

  /** Skewness and excess kurtosis of the order value distribution per
    * priority — the shape screen behind outlier thresholds and
    * log-transform decisions. Same discipline as [[qCorrMatrix]]:
    * integer-unit prices, exact DECIMAL(38,0) power sums S1..S4
    * (S4 ≤ n·8e22 — safe past 1e14 rows), then the central-moment
    * formulas as ONE identical double expression per engine. One
    * map-side-combined pass, 5 result rows at any scale. */
  def qSkewKurtosis(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val b = round(col("o_totalprice")).cast("long")
    Tables(spark, dir).orders
      .select(col("o_orderpriority"), b.as("b"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("b").cast(dec)).as("s1"),
        sum((col("b") * col("b")).cast(dec)).as("s2"),
        sum((col("b").cast(dec) * col("b") * col("b")).cast(dec)).as("s3"),
        sum((col("b").cast(dec) * col("b") * col("b") * col("b")).cast(dec))
          .as("s4"))
      .select(Seq(col("o_orderpriority"), col("n")) ++
        skewKurtCols(col("n").cast("double"), col("s1").cast("double"),
          col("s2").cast("double"), col("s3").cast("double"),
          col("s4").cast("double")): _*)
      .orderBy("o_orderpriority")
  }

  /** Shared double-expression tail of [[qSkewKurtosis]] — kept in one
    * place so the Scala and SQL sides stay structurally identical. */
  private def skewKurtCols(nd: org.apache.spark.sql.Column,
                           s1: org.apache.spark.sql.Column,
                           s2: org.apache.spark.sql.Column,
                           s3: org.apache.spark.sql.Column,
                           s4: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    val m = s1 / nd
    val v = s2 / nd - m * m
    Seq(
      round(m, 2).as("mean_price"),
      round(sqrt(v), 2).as("stddev_pop"),
      // σ³ as v·sqrt(v), NOT pow(v, 1.5): sqrt/·/÷ are IEEE
      // correctly-rounded (bit-identical across engines); pow is
      // libm-dependent and can differ in the last ulp
      round((s3 / nd - lit(3.0) * m * (s2 / nd) + lit(2.0) * m * m * m) /
        (v * sqrt(v)), 4).as("skewness"),
      round((s4 / nd - lit(4.0) * m * (s3 / nd) +
        lit(6.0) * m * m * (s2 / nd) - lit(3.0) * m * m * m * m) /
        (v * v) - lit(3.0), 4).as("excess_kurtosis"))
  }

  /** Median and median-absolute-deviation of order value per priority —
    * the robust-statistics twin of [[qSkewKurtosis]]. Values are
    * DOUBLED integer units so both the median and every |x − med| stay
    * on an exact 0.5-grid (no float comparison risk between engines:
    * Spark's exact `percentile` and DuckDB's `quantile_cont` both
    * interpolate at (n−1)/2, which on the doubled grid is always a
    * whole or half integer, exactly representable). Two passes over
    * orders; percentile state is bounded by the DISTINCT quantized
    * value count (~5e5 price units) per group regardless of row count,
    * so the plan holds at 100 TB. */
  def qMedianMad(spark: SparkSession, dir: String): DataFrame = {
    val b2 = (round(col("o_totalprice")) * 2).cast("long")
    val o = Tables(spark, dir).orders
      .select(col("o_orderpriority"), b2.as("b2"))
    val med = o.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        expr("percentile(b2, 0.5)").as("med2"))
    o.join(med, "o_orderpriority")
      .select(col("o_orderpriority"), col("n_orders"), col("med2"),
        abs(col("b2").cast("double") - col("med2")).as("dev2"))
      .groupBy("o_orderpriority")
      .agg(first("n_orders").as("n_orders"), first("med2").as("med2"),
        expr("percentile(dev2, 0.5)").as("mad2"))
      .select(col("o_orderpriority"), col("n_orders"),
        round(col("med2") / 2.0, 2).as("median_price"),
        round(col("mad2") / 2.0, 2).as("mad_price"))
      .orderBy("o_orderpriority")
  }

  /** RFM segmentation: every customer scored 1–5 on Recency (days
    * since last order, most recent = 1), Frequency (order count,
    * most = 1) and Monetary (lifetime value, most = 1), each score an
    * exact SQL-ntile quintile — the classic CRM mixing/stratification
    * recipe, and at 100 TB the canonical "bucket a billion users by
    * rank" job.
    *
    * Scale shape: one groupBy collapses orders to |customers| rows;
    * the three quintile passes use [[Distributed.ntile]] — the
    * two-phase range-partitioned global rank — so NO single-partition
    * window touches the |customers|-row table (the attack-robustness
    * lesson, applied up front). Monetary is summed in exact cent longs
    * (order-free, engine-portable); output is the ≤125-cell segment
    * cube. */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val scope = new graft.Materialize.Scoped()
    val maxd = t.orders.agg(max("o_orderdate").as("max_date"))
    val per = t.orders.groupBy("o_custkey")
      .agg(max("o_orderdate").as("last_order"),
        count(lit(1)).as("frequency"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("monetary_cents"))
      .crossJoin(broadcast(maxd))
      .select(col("o_custkey"),
        datediff(col("max_date"), col("last_order")).as("recency_days"),
        col("frequency"), col("monetary_cents"))
    val base = scope.table(per)
    val r = Distributed.ntile(base,
      Seq(col("recency_days").asc, col("o_custkey").asc), 5, "r_score",
      scope = scope)
    val rf = Distributed.ntile(r,
      Seq(col("frequency").desc, col("o_custkey").asc), 5, "f_score",
      scope = scope)
    val rfm = Distributed.ntile(rf,
      Seq(col("monetary_cents").desc, col("o_custkey").asc), 5, "m_score",
      scope = scope)
    // avg as an exact BIGINT of cents: DuckDB's round(x, 2) rescales in
    // floating point (x*100 → round → /100) and can land one ulp off
    // Spark's decimal-exact round — observed on one segment; integer
    // rounding operates on the identical double directly, no rescale
    val out = rfm.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("monetary_cents")) / count(lit(1)).cast("double"))
          .cast("long").as("avg_monetary_cents"))
      .orderBy("r_score", "f_score", "m_score")
    scope.seal(out)
  }

  /** ABC / Pareto analysis: parts classed A/B/C by cumulative share of
    * total revenue (A = first 80%, B = next 15%, C = tail) — the 80/20
    * inventory cut, i.e. a GLOBAL running total over every part ranked
    * by revenue.
    *
    * Scale shape: revenue is rounded to cents per row and summed as
    * longs (exact, order-free); the global cumulative sum is
    * [[Distributed.rankedPrefix]] — range-repartition + local scan +
    * broadcast offsets, the Blelloch-scan shape — never a
    * single-partition `sum().over(Window.orderBy(...))`. Class
    * boundaries compare exact integers (cum·5 ≤ tot·4), so no float
    * sits on a classification edge. Output: 3 rows. */
  def qAbcPareto(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val scope = new graft.Materialize.Scoped()
    val rev = t.lineitem.groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100).cast("long")).as("rev_cents"))
    val ranked = Distributed.rankedPrefix(scope.table(rev),
      Seq(col("rev_cents").desc, col("l_partkey").asc), col("rev_cents"),
      rankName = "rev_rank", cumName = "cum_cents", scope = scope)
    val tot = ranked.agg(max("cum_cents").as("t"))
    val out = ranked.crossJoin(broadcast(tot))
      .select(
        when(col("cum_cents") * 5 <= col("t") * 4, "A")
          .when(col("cum_cents") * 20 <= col("t") * 19, "B")
          .otherwise("C").as("abc_class"),
        col("rev_cents"), col("t"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"),
        sum("rev_cents").as("class_rev_cents"),
        round(sum(col("rev_cents")) / max(col("t")).cast("double"), 6)
          .as("rev_share"))
      .orderBy("abc_class")
    scope.seal(out)
  }

  /** Benford first-digit screen: distribution of the leading
    * significant digit of order totals vs Benford's log₁₀(1+1/d)
    * expectation — the classic large-ledger anomaly/fraud test.
    * The digit comes from the CENT-integer's decimal string (shifting
    * by 100 preserves the leading digit), not from `log10` — no float
    * anywhere near the classification. Expected shares are pinned
    * 6-dp literals, not engine `log10` calls, because JVM and C libm
    * may differ in the last ulp. Map-side digit extraction, one 9-row
    * aggregate: embarrassingly scalable. */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val expected = Seq(
      1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
      5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
      9 -> 0.045757)
    val expCol = expected.tail.foldLeft(
      when(col("digit") === 1, expected.head._2)) {
      case (acc, (d, p)) => acc.when(col("digit") === d, p)
    }
    val digits = t.orders.select(
      substring(round(col("o_totalprice") * 100).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum("n").as("tot"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") / col("tot").cast("double"), 6).as("observed_p"),
        expCol.as("benford_p"),
        round(abs(col("n") / col("tot").cast("double") - expCol), 6)
          .as("abs_dev"))
      .orderBy("digit")
  }

  /** Bloom-prefiltered join: revenue of URGENT-priority orders by ship
    * year, with the lineitem probe side pre-filtered by a Bloom sketch
    * of the qualifying order keys BEFORE the join shuffle.
    *
    * The point at 100 TB: ~1/5 of orders are urgent, so a plain join
    * shuffles 5× the lineitem rows that can match. The sketch is built
    * in one pass over the (already filtered, much smaller) build side
    * and shipped to every scan task as a plan constant via the
    * codegen'd [[graft.functions.BloomMightContain]]; false positives
    * are eliminated by the exact join that follows, so the result is
    * IDENTICAL to the plain join — the oracle runs the plain SQL. This
    * is Spark's runtime-row-filter trick as an explicit, controllable
    * operator. */
  def qBloomPrefilter(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val urgent = t.orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    // one aggregate pass sizes the sketch (at scale: approx_count_distinct)
    val n = math.max(urgent.count(), 1L)
    val bf = urgent.stat.bloomFilter("o_orderkey", n, 0.01)
    t.lineitem
      .filter(graft.functions.BloomMightContain.mightContain(bf, col("l_orderkey")))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("l_shipdate")).as("ship_year"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("ship_year")
  }

  /** Customer lifetime-value decile report: customers ranked by exact
    * cent-integer lifetime spend, cut into SQL-ntile deciles via
    * [[Distributed.ntile]] (no |customers|-row global window), with
    * per-decile population, value range and share — the "whales vs
    * tail" table behind every LTV dashboard. 10-row output. */
  def qValueDeciles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val scope = new graft.Materialize.Scoped()
    val per = t.orders.groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("value_cents"))
    val dec = Distributed.ntile(scope.table(per),
      Seq(col("value_cents").desc, col("o_custkey").asc), 10, "decile",
      scope = scope)
    val tot = dec.agg(sum("value_cents").as("t"))
    val out = dec.crossJoin(broadcast(tot))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        min("value_cents").as("min_cents"),
        max("value_cents").as("max_cents"),
        sum("value_cents").as("decile_cents"),
        round(sum(col("value_cents")) / max(col("t")).cast("double"), 6)
          .as("value_share"))
      .orderBy("decile")
    scope.seal(out)
  }

  /** Gini coefficient of customer lifetime value — the revenue-
    * concentration one-number ("what share of customers carry the
    * book"), computed EXACTLY: cent-integer values, global value rank
    * from [[Distributed.rankedPrefix]] (range exchange + per-partition
    * scan, never a single-partition window), and the rank-weighted sum
    * Σ rank·value carried in DECIMAL(38,0)/HUGEINT (rank×cents
    * overflows a long at ~10⁹ customers — the corr-matrix power-sum
    * discipline). One identical IEEE double expression per engine at
    * the end. */
  def qValueGini(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val scope = new graft.Materialize.Scoped()
    val per = t.orders.groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
    val ranked = Distributed.rankedPrefix(scope.table(per),
      Seq(col("v").asc, col("o_custkey").asc), col("v"),
      rankName = "rk", cumName = "cum", scope = scope)
    val out = ranked
      .agg(count(lit(1)).as("n"), sum("v").as("s1"),
        sum(col("rk").cast("decimal(19,0)") * col("v").cast("decimal(19,0)"))
          .as("s2"))
      .select(col("n").as("n_customers"),
        round(lit(2) * col("s2").cast("double") /
          (col("n").cast("double") * col("s1").cast("double")) -
          (col("n") + 1) / col("n").cast("double"), 6).as("value_gini"))
    scope.seal(out)
  }

  /** Exact distinct-user overlap matrix across event types: how many
    * users did BOTH type a and type b — the audience-overlap question
    * HLL sketches cannot answer (no intersection), solved exactly with
    * the two-phase distinct discipline: ONE map-side-combined distinct
    * over (type, user) pairs, then a user-keyed self-join whose fanout
    * is bounded by types² per user regardless of event count. The
    * diagonal is each type's own distinct-user count. ≤ types²/2 rows
    * out at any scale. */
  def qEventTypeOverlap(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val p = t.events.select("event_type", "user_id").distinct()
    p.select(col("event_type").as("type_a"), col("user_id"))
      .join(p.select(col("event_type").as("type_b"), col("user_id")), "user_id")
      .filter(col("type_a") <= col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_common_users"))
      .orderBy("type_a", "type_b")
  }
}
