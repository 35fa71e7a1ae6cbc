package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph export sinks — the engine-side analog of the reference's
  * sample-graph plot artifacts (main.py:200-206 draws the sampled graph
  * and degree histogram to EPS via matplotlib/NetworkX; an engine emits
  * the graph in a portable text format instead and leaves rendering to
  * any Graphviz/Gephi front-end).
  *
  * The serialization is a DataFrame of (section, k1, k2, line) rows —
  * header, one line per vertex, one per edge, footer — ordered by the
  * key columns, NOT by a global row_number (which would funnel the
  * whole graph through one window task): consumers `orderBy(section,
  * k1, k2)` on read or let the sink's write ordering handle it, so the
  * export scales like any other columnar query. Line text is
  * deterministic string formatting, which also makes the export
  * SQL-oracle-checkable. */
object GraphExport {

  /** Persist a graph as a parquet layout (`path/vertices`,
    * `path/edges`) — the save half of a GraphFrames-style
    * save/load round trip. Edges are repartitioned on `src` before
    * the write so a reloaded graph's edge files are already
    * src-clustered (degree/adjacency scans touch co-located rows);
    * at 100 TB this is the difference between a layout the next job
    * can exploit and a random one. */
  def saveParquet(g: Graph, path: String): Unit = {
    g.vertices.write.mode("overwrite").parquet(s"$path/vertices")
    g.edges.repartition(g.edges.rdd.getNumPartitions, col("src"))
      .write.mode("overwrite").parquet(s"$path/edges")
  }

  /** Load the [[saveParquet]] layout back into a [[Graph]]. */
  def loadParquet(spark: org.apache.spark.sql.SparkSession,
                  path: String): Graph =
    Graph(spark.read.parquet(s"$path/vertices"),
      spark.read.parquet(s"$path/edges"))

  /** Graphviz DOT lines for an undirected graph. */
  def dotLines(g: Graph, name: String = "sample"): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val header = Seq((0, 0L, 0L, s"graph $name {")).toDF("section", "k1", "k2", "line")
    val vertices = g.vertices.select(
      lit(1).as("section"), col("id").as("k1"), lit(0L).as("k2"),
      concat(lit("  "), col("id").cast("string"), lit(";")).as("line"))
    val edges = g.edges.select(
      lit(2).as("section"), col("src").as("k1"), col("dst").as("k2"),
      concat(lit("  "), col("src").cast("string"), lit(" -- "),
        col("dst").cast("string"), lit(";")).as("line"))
    val footer = Seq((3, 0L, 0L, "}")).toDF("section", "k1", "k2", "line")
    header.union(vertices).union(edges).union(footer)
  }
}
