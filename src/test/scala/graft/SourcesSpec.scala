package graft

import graft.functions.GraftFunctions
import graft.sources.EdgeListSource
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("edge-list source reads SNAP-style files like the reference's input") {
    val f = Files.createTempFile("edges", ".txt")
    Files.writeString(f,
      """# comment line
        |0 1
        |1 0
        |1 2
        |2 2
        |3 4
        |""".stripMargin)
    val g = EdgeListSource.graphFromEdgeList(spark, f.toString)
    // canonical: dedup of 0-1/1-0, self-loop 2-2 dropped
    val edges = g.edges.as[(Long, Long)].collect().toSet
    assert(edges == Set((0L, 1L), (1L, 2L), (3L, 4L)))
    assert(g.vertices.as[Long].collect().toSet == Set(0L, 1L, 2L, 3L, 4L))
    val deg = g.degrees.as[(Long, Long)].collect().toMap
    assert(deg(1L) == 2 && deg(3L) == 1)
  }

  test("edge-list source reproduces the reference's facebook graph stats") {
    // the reference's actual input (SNAP ego-Facebook); skip if absent.
    // Known public stats: 4039 vertices, 88234 undirected edges.
    val path = "/root/reference/facebook/facebook_combined.txt"
    assume(new java.io.File(path).exists())
    val g = EdgeListSource.graphFromEdgeList(spark, path)
    assert(g.vertices.count() == 4039L)
    assert(g.edges.count() == 88234L)
    val deg = g.degrees
    assert(deg.agg(org.apache.spark.sql.functions.max("degree"))
      .head().getLong(0) == 1045L) // known hub
  }

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
        |             array(cast(1.0 as float), cast(0.0 as float))) AS cs,
        |  simhash64(array('a','b')) AS sh,
        |  jaccard_sorted(array('a','b','c'), array('b','c','d')) AS js
        |""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
    assert(row.getLong(1) != 0L)
    assert(math.abs(row.getDouble(2) - 0.5) < 1e-9)
  }

  test("minhash_sig from SQL estimates jaccard of identical sets as 1") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT equal_fraction(minhash_sig(array('x','y','z')),
        |                      minhash_sig(array('z','y','x'))) AS f
        |""".stripMargin).head().getDouble(0)
    assert(r == 1.0)
  }
}
