package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the settings every entry point shares.
  *
  * Local mode is a stand-in for a real cluster: shuffle partitions are
  * sized to the core count (not Spark's default 200), AQE is on so
  * skewed joins re-plan at runtime, and the session timezone is pinned
  * to UTC for oracle parity.
  */
object GraftSession {
  def builder(appName: String, cpus: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Kryo (with chill's Scala registrar) for the GraphX loops: LPA
      // ships Map messages and BFS ships Array states through the
      // shuffle serializer every superstep. Measured NEUTRAL at
      // local[32] (superstep scheduling dominates, volumes tiny), but
      // on a multi-executor cluster those messages cross the network
      // and Kryo is the GraphX-recommended default. The DataFrame side
      // is UnsafeRow/Tungsten and ignores this setting.
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")

  def get(appName: String, cpus: Int = 32): SparkSession = {
    val spark = builder(appName, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Key for the per-dir memo caches (GraphBuilder, louvain phase-1,
    * LSH pairs, IVF index): binds the entry to the SESSION that built
    * it, not just the path. A dir-only key served stale frames when a
    * long-lived JVM saw the dir's data regenerated and read it through
    * a fresh session (this environment's driver does exactly that
    * between rounds) — sessionUUID is unique per SparkSession instance,
    * so a new session always rebuilds. */
  def sessionKey(spark: SparkSession, dir: String): String =
    // object identity, not sessionUUID (private[sql] in Spark 4): unique
    // per LIVE session, and every cache entry strongly references its
    // session through the persisted DataFrame, so a key can't be
    // re-issued to a new session while its entry is still served
    System.identityHashCode(spark).toString + ":" + dir

  /** Register every test table as a temp view (+ the graft SQL
    * functions), so the whole surface is reachable from `spark.sql` —
    * how a reference user actually works. Views are lazy scans; no
    * data moves at registration. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    Seq("region" -> t.region, "nation" -> t.nation,
      "customer" -> t.customer, "supplier" -> t.supplier,
      "part" -> t.part, "orders" -> t.orders, "lineitem" -> t.lineitem,
      "events" -> t.events, "documents" -> t.documents,
      "embeddings" -> t.embeddings)
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
    graft.functions.GraftFunctions.register(spark)
  }
}

/** Typed access to the driver-generated test tables (TESTDATA.md).
  *
  * All readers are plain parquet scans — Catalyst pushes projections and
  * filters down to the scan, so callers should NOT pre-select columns
  * here; declare the full query and let the optimizer prune.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")

  /** events.parquet has shipped with two physical `ts` encodings:
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
    * nanos as long and project to a microsecond timestamp) and plain
    * timestamp[us] (read natively). Dispatch on the READ schema so both
    * generations of the data work; either way it stays one scan with
    * pushdown intact. */
  def events: DataFrame = {
    // lets old nanos-generation dirs load at all; no effect on µs files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventsTs(t("events"))
  }

  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types._

  /** Normalize an events frame's `ts` to session-zoned TimestampType,
    * whatever the parquet generation delivered:
    *  - LongType         — nanos read under `legacy.parquet.nanosAsLong`;
    *                       integer `DIV 1000` (double division loses ns
    *                       precision at ~1.7e18 and can shift a boundary
    *                       timestamp by 1 ms), then `timestamp_micros`.
    *  - TimestampNTZType — timestamp[us] with isAdjustedToUTC=false; the
    *                       session timezone is pinned to UTC, so the cast
    *                       reinterprets the same wall-clock micros.
    *  - TimestampType    — already what every consumer expects.
    * Pure projections in all cases: one scan, pushdown intact. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other")
    }
}
