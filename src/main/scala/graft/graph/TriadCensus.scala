package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Holland–Leinhardt triad census of a directed graph — all 16
  * isomorphism classes of 3-vertex subdigraphs (003 … 300), the core
  * SNA structural signature one level above [[GraphQueries.dyadCensus]]
  * (nx.triadic_census parity; the reference's SNA toolkit family).
  *
  * Exact and distributed via the Batagelj–Mrvar decomposition:
  *   1. CONNECTED triples with ≥2 linked dyads are enumerated once
  *      each by three disjoint vertex-ordered join patterns over the
  *      canonical pair table, then classified by a 64-entry dyad-code
  *      lookup (a broadcast map literal, codegen'd).
  *   2. Single-dyad triads (012/102) come from counting, not
  *      enumeration: (n−2)·#dyads minus the multi-dyad triples each
  *      dyad participates in — two aggregates, no |V|-fan-out.
  *   3. 003 is C(n,3) minus everything else.
  * So the only super-linear stage is the unavoidable one: enumerating
  * triples that actually have ≥2 edges (Σ C(pairdeg, 2) wedges —
  * that set must be touched by ANY exact census; skewed hubs land on
  * the AQE skew-join path).
  */
object TriadCensus {

  /** The 16 type names, in output (lexicographic) order. */
  val TriadTypes: Seq[String] = Seq("003", "012", "021C", "021D", "021U",
    "030C", "030T", "102", "111D", "111U", "120C", "120D", "120U",
    "201", "210", "300")

  /** Classify one vertex-ordered triple (a<b<c) from its three dyad
    * codes (0 none, 1 low→high, 2 high→low, 3 mutual).
    *
    * Suffix conventions (Holland–Leinhardt / Pajek / nx):
    *   021D A←B→C (diverge), 021U A→B←C (converge), 021C chain;
    *   111D third→pair ("0↔1←2"), 111U pair→third ("0↔1→2");
    *   030T transitive, 030C cyclic;
    *   120* = 021* plus the closing mutual dyad.
    */
  def classify(cab: Int, cac: Int, cbc: Int): String = {
    val codes = Seq(cab, cac, cbc)
    val arcs: Set[(Int, Int)] = Seq((cab, 0, 1), (cac, 0, 2), (cbc, 1, 2))
      .flatMap { case (code, x, y) => code match {
        case 0 => Nil
        case 1 => Seq((x, y))
        case 2 => Seq((y, x))
        case _ => Seq((x, y), (y, x))
      }}.toSet
    val m = codes.count(_ == 3)
    val a = codes.count(c => c == 1 || c == 2)
    val base = s"$m$a${codes.count(_ == 0)}"
    def asymArcs = arcs.filterNot(ar => arcs.contains(ar.swap))
    base match {
      case "021" | "120" =>
        val suffix =
          if (asymArcs.map(_._1).size == 1) "D"
          else if (asymArcs.map(_._2).size == 1) "U"
          else "C"
        base + suffix
      case "111" =>
        val mutualVerts = arcs.filter(ar => arcs.contains(ar.swap))
          .flatMap(ar => Seq(ar._1, ar._2))
        val third = Seq(0, 1, 2).find(v => !mutualVerts.contains(v)).get
        if (asymArcs.head._1 == third) "111D" else "111U"
      case "030" =>
        if (arcs.map(_._1).size == 3) "030C" else "030T"
      case b => b
    }
  }

  /** code(cab, cac, cbc) → type, for all 64 combinations. */
  val codeToType: Map[Int, String] = (for {
    cab <- 0 to 3; cac <- 0 to 3; cbc <- 0 to 3
  } yield (cab * 16 + cac * 4 + cbc) -> classify(cab, cac, cbc)).toMap

  /** The census of a distinct directed edge DataFrame [src, dst]
    * (no self-loops). Output: (triad_type, n_triads), all 16 rows,
    * ordered by type. */
  def census(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // canonical pair table: one row per linked unordered pair, with
    // its dyad code — the same single groupBy as the dyad census.
    val pc = graft.Materialize.table(edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"),
        when(col("src") < col("dst"), 1).otherwise(2).as("dir"))
      .groupBy("lo", "hi")
      .agg((max(when(col("dir") === 1, 1).otherwise(0)) +
        lit(2) * max(when(col("dir") === 2, 1).otherwise(0))).as("code")))
    val n = pc.select(explode(array(col("lo"), col("hi"))).as("v"))
      .agg(countDistinct("v")).head().getLong(0)

    // triples with >=2 linked dyads, vertex-ordered a<b<c, each
    // exactly once: T1 shares a (AB,AC present), T2 shares b with AC
    // absent, T3 shares c with AB absent — disjoint by construction.
    def p(names: (String, String, String)) =
      pc.select(col("lo").as(names._1), col("hi").as(names._2),
        col("code").as(names._3))
    val t1 = p(("a", "b", "cab"))
      .join(p(("a", "c", "cac")), Seq("a"))
      .filter(col("c") > col("b"))
      .join(p(("b", "c", "cbc")), Seq("b", "c"), "left")
      .na.fill(0, Seq("cbc"))
    val t2 = p(("a", "b", "cab"))
      .join(p(("b", "c", "cbc")), Seq("b"))
      .join(p(("a", "c", "cac")), Seq("a", "c"), "left_anti")
      .withColumn("cac", lit(0))
    val t3 = p(("a", "c", "cac"))
      .join(p(("b", "c", "cbc")), Seq("c"))
      .filter(col("b") > col("a"))
      .join(p(("a", "b", "cab")), Seq("a", "b"), "left_anti")
      .withColumn("cab", lit(0))
    val typed = t1.select("cab", "cac", "cbc")
      .unionByName(t2.select("cab", "cac", "cbc"))
      .unionByName(t3.select("cab", "cac", "cbc"))
      .select(element_at(typedLit(codeToType),
          col("cab") * 16 + col("cac") * 4 + col("cbc")).as("triad_type"),
        ((col("cab") === 3).cast("long") + (col("cac") === 3).cast("long") +
          (col("cbc") === 3).cast("long")).as("nmut"),
        (col("cab").isin(1, 2).cast("long") +
          col("cac").isin(1, 2).cast("long") +
          col("cbc").isin(1, 2).cast("long")).as("nasym"))

    // one pass over the (small) classified stream: per-type counts
    // plus the two subtraction terms for the single-dyad formulas
    val agg = typed.groupBy("triad_type")
      .agg(count(lit(1)).as("cnt"), sum("nmut").as("sm"), sum("nasym").as("sa"))
      .collect()
    val multiCounts = agg.map(r => r.getString(0) -> r.getLong(1)).toMap
    val subM = agg.map(_.getLong(2)).sum
    val subA = agg.map(_.getLong(3)).sum
    val dyads = pc.agg(
      sum((col("code") === 3).cast("long")).as("m"),
      sum(col("code").isin(1, 2).cast("long")).as("a")).head()
    val (dm, da) = (dyads.getLong(0), dyads.getLong(1))

    val c012 = (n - 2) * da - subA
    val c102 = (n - 2) * dm - subM
    val multiTotal = multiCounts.values.sum
    val c003 = n * (n - 1) * (n - 2) / 6 - multiTotal - c012 - c102
    val full = TriadTypes.map { t =>
      val cnt = t match {
        case "003" => c003
        case "012" => c012
        case "102" => c102
        case _     => multiCounts.getOrElse(t, 0L)
      }
      (t, cnt)
    }
    full.toDF("triad_type", "n_triads").orderBy("triad_type")
  }

  /** SparkEntry wrapper: census of the directed purchase-sequence
    * graph (same derivation as SCC / reciprocity / dyad census). */
  def census(spark: SparkSession, dir: String): DataFrame =
    census(Scc.lineSequenceEdges(spark, dir))
}
