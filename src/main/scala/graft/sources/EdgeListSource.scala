package graft.sources

import graft.graph.{Graph, GraphBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Edge-list file ingestion — the reference's actual input path: a
  * delimiter-separated src/dst pair file (ref: /root/reference/main.py:
  * 25-26 loads `facebook/facebook_combined.txt` with the CSV reader and
  * space delimiter, then derives vertices as the distinct endpoints,
  * main.py:28-41).
  *
  * The reference normalizes edge endpoints against the vertex table with
  * two driver-planned joins (main.py:33-37); with a typed schema that is
  * unnecessary — endpoints ARE the ids. Vertices come from one distinct
  * over the symmetrized endpoints: a single shuffle.
  */
object EdgeListSource {

  private val schema = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  /** Read a delimited edge list (e.g. SNAP datasets: `src dst` per
    * line, `#` comments) into canonical undirected form. */
  def readEdgeList(spark: SparkSession, path: String,
                   delimiter: String = " "): DataFrame =
    spark.read
      .schema(schema)
      .option("delimiter", delimiter)
      .option("comment", "#")
      .option("mode", "DROPMALFORMED")
      .csv(path)
      // canonicalize: undirected, src < dst, dedup; self-loops dropped
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") < col("dst"))
      .distinct()

  /** Full graph from an edge-list file (ref create_graph, main.py:24-41). */
  def graphFromEdgeList(spark: SparkSession, path: String,
                        delimiter: String = " "): Graph = {
    val e = readEdgeList(spark, path, delimiter)
    Graph(GraphBuilder.vertices(e), e)
  }
}
