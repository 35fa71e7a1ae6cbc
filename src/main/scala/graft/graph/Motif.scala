package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Motif (pattern) queries — GraphFrames' signature `g.find(...)` API
  * (the reference's library exposes it via `from graphframes import
  * GraphFrame`, /root/reference/main.py:3), re-expressed as a Catalyst
  * join builder.
  *
  * Pattern grammar (GraphFrames-compatible):
  *   - `(a)-[e]->(b)`   edge term; vertex/edge names bind columns
  *   - `(a)-[]->(b)`    anonymous edge (no output column)
  *   - `()-[]->(b)`     anonymous vertex (joins nothing, no column)
  *   - `!(a)-[]->(b)`   negated term: no edge a→b (left-anti join);
  *                      both vertices must be bound by a positive term
  *   - `(a)`            standalone vertex term
  *   - terms separated by `;`
  *
  * Each named vertex becomes a LONG id column, each named edge a
  * `struct(src, dst)` column — or, via the attributed-edges overload,
  * the full edge row `struct(src, dst, attr…)` so filters like
  * `e.weight > 2` work as in GraphFrames. (Vertices carry no further
  * attributes — the flat shape keeps the whole plan inside
  * whole-stage codegen and is directly SQL-oracle-comparable.)
  *
  * Execution is pure DataFrame algebra: one join per edge term on the
  * already-bound vertex columns (cross join only for genuinely
  * disconnected patterns), anti-joins for negations — so Catalyst
  * reorders/broadcasts freely and the plan scales exactly like any
  * hand-written join chain. Undirected semantics: terms match against
  * the symmetrized edge set, both directions of every stored edge,
  * which is what a GraphFrame built from both edge directions returns.
  * Like GraphFrames, no implicit inequality between distinct names —
  * add `.filter` for that.
  */
object Motif {

  private final case class Term(src: String, edge: Option[String],
                                dst: String, negated: Boolean)

  private val EdgeRe =
    """(!?)\s*\(([A-Za-z0-9_]*)\)\s*-\s*\[([A-Za-z0-9_]*)\]\s*->\s*\(([A-Za-z0-9_]*)\)""".r
  private val VertexRe = """\(([A-Za-z0-9_]+)\)""".r

  private def parse(pattern: String): Seq[Either[String, Term]] = {
    var anon = -1
    def fresh(): String = { anon += 1; s"__anon$anon" }
    pattern.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case EdgeRe(neg, s, e, d) =>
        val t = Term(
          if (s.isEmpty) fresh() else s,
          if (e.isEmpty) None else Some(e),
          if (d.isEmpty) fresh() else d,
          neg == "!")
        if (t.negated && t.edge.isDefined)
          throw new IllegalArgumentException(
            s"negated term cannot name an edge: $pattern")
        Right(t)
      case VertexRe(v) => Left(v)
      case other =>
        throw new IllegalArgumentException(s"cannot parse motif term '$other'")
    }
  }

  /** Run the pattern against `g`; see object doc for grammar and
    * output shape. A named edge binds the graph's OWN edge row —
    * `struct(src, dst, attr…)` when `g.edges` carries attribute
    * columns (GraphFrames' API shape: `find(g, "(a)-[e]->(b)")
    * .filter("e.weight > 2")` needs no separate edge table), plain
    * `struct(src, dst)` otherwise. */
  def find(g: Graph, pattern: String): DataFrame =
    find(g, pattern, g.edges)

  /** GraphFrames-parity `find` over an ATTRIBUTED edge relation:
    * `attributedEdges` is the canonical one-row-per-undirected-edge
    * table (src, dst, attr…) — e.g. the weighted co-purchase edges —
    * and a named edge binds the FULL edge row as
    * `struct(src, dst, attr…)`, so
    * `find(g, "(a)-[e]->(b)", weighted).filter("e.weight > 2")` works
    * exactly like GraphFrames' edge-attribute filters. Undirected
    * semantics match [[Graph.symmetrized]]: each stored edge matches in
    * both directions, attributes riding along unchanged. */
  def find(g: Graph, pattern: String, attributedEdges: DataFrame): DataFrame = {
    val attrs =
      attributedEdges.columns.filterNot(c => c == "src" || c == "dst").toSeq
    val fwd = attributedEdges
      .select(("src" +: "dst" +: attrs).map(col): _*)
    val rev = attributedEdges
      .select((col("dst").as("src") +: col("src").as("dst") +:
        attrs.map(col)): _*)
    findImpl(g.vertices, fwd.unionByName(rev), attrs, pattern)
  }

  private def findImpl(vertices: DataFrame, sym: DataFrame,
                       attrs: Seq[String], pattern: String): DataFrame = {
    val terms = parse(pattern)
    if (terms.isEmpty)
      throw new IllegalArgumentException("empty motif pattern")

    var acc: DataFrame = null
    var bound = Set.empty[String]
    // output columns in first-appearance order
    var outCols = Vector.empty[String]
    def noteVertex(v: String): Unit =
      if (!v.startsWith("__anon") && !outCols.contains(v)) outCols :+= v

    def merge(t: DataFrame, tCols: Seq[String]): Unit = {
      if (acc == null) acc = t
      else {
        val shared = tCols.filter(bound.contains).distinct
        acc = if (shared.nonEmpty) acc.join(t, shared) else acc.crossJoin(t)
      }
      bound ++= tCols
    }

    // the bound edge struct is the full edge row (src, dst, attr…) —
    // built straight from the source columns BEFORE the rename, so
    // attribute names never leak flat into the join accumulator and
    // two attributed terms can't collide
    def edgeStruct: Column =
      struct((col("src").as("src") +: col("dst").as("dst") +:
        attrs.map(a => col(a).as(a))): _*)

    terms.foreach {
      case Left(v) =>
        noteVertex(v)
        if (!bound.contains(v))
          merge(vertices.select(col("id").as(v)), Seq(v))
      case Right(t) if !t.negated =>
        noteVertex(t.src); noteVertex(t.dst)
        t.edge.foreach { e =>
          outCols = if (outCols.contains(e)) outCols else outCols :+ e
        }
        val withEdge =
          if (t.src == t.dst) { // self-loop term: equality within the edge
            val base = sym.filter(col("src") === col("dst"))
            t.edge match {
              case Some(e) =>
                base.select(col("src").as(t.src), edgeStruct.as(e))
              case None => base.select(col("src").as(t.src))
            }
          } else t.edge match {
            case Some(e) => sym.select(col("src").as(t.src),
              col("dst").as(t.dst), edgeStruct.as(e))
            case None => sym.select(col("src").as(t.src),
              col("dst").as(t.dst))
          }
        merge(withEdge, Seq(t.src, t.dst).distinct)
      case Right(t) => // negated: defer until all positives bound? No —
        // GraphFrames requires negated vertices be bound by earlier
        // positive terms; enforce the same
        if (!bound.contains(t.src) || !bound.contains(t.dst))
          throw new IllegalArgumentException(
            s"negated term references unbound vertices: (${t.src})-[]->(${t.dst})")
        acc = acc.join(
          sym.select(col("src").as(t.src), col("dst").as(t.dst)),
          Seq(t.src, t.dst), "left_anti")
    }
    acc.select(outCols.map(col): _*)
  }
}
