package graft

import graft.graph.{Graph, GraphBuilder, Motif}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MotifSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // triangle 1-2-3 plus pendant 3-4
  private def tiny: Graph = {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    Graph(GraphBuilder.vertices(e), e)
  }

  test("edge pattern matches both directions of every undirected edge") {
    val r = Motif.find(tiny, "(a)-[]->(b)").as[(Long, Long)].collect().toSet
    assert(r.size == 8) // 4 canonical edges × 2 directions
    assert(r.contains((1L, 2L)) && r.contains((2L, 1L)))
  }

  test("triangle pattern count = 6 x triangle count (known graph)") {
    val n = Motif.find(tiny, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)").count()
    assert(n == 6) // one triangle, 3! orientations
  }

  test("triangle pattern cross-checks the oriented-intersection pipeline at sf") {
    val g = GraphBuilder.coPurchase(spark, sf)
    val viaMotif = Motif.find(g, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")
      .count() / 6
    val viaPipeline = g.triangleVertexCounts.agg(sum("triangles"))
      .head().getLong(0) / 3
    assert(viaMotif == viaPipeline)
  }

  test("negated term subtracts closed wedges (open + closed = all)") {
    val g = tiny
    val all = Motif.find(g, "(a)-[]->(b); (b)-[]->(c)")
      .filter($"a" =!= $"c").count()
    val open = Motif.find(g, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
      .filter($"a" =!= $"c").count()
    val closed = Motif.find(g, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)").count()
    // (a)-[]->(c) positive closure never matches a = c (no self-loops),
    // so the closed set needs no explicit inequality
    assert(open + closed == all)
    assert(closed == 6)
  }

  test("named edges come back as (src, dst) structs") {
    val r = Motif.find(tiny, "(a)-[e]->(b)")
    assert(r.columns.toSeq == Seq("a", "b", "e"))
    val row = r.filter($"a" === 1L && $"b" === 2L).head()
    val e = row.getStruct(2)
    assert(e.getLong(0) == 1L && e.getLong(1) == 2L)
  }

  test("attributed edges bind full structs and filter on e.weight") {
    val we = Seq((1L, 2L, 5L), (1L, 3L, 1L), (2L, 3L, 3L), (3L, 4L, 2L))
      .toDF("src", "dst", "weight")
    val r = Motif.find(tiny, "(a)-[e]->(b)", we)
    assert(r.columns.toSeq == Seq("a", "b", "e"))
    assert(r.schema("e").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("src", "dst", "weight"))
    // weight > 2 keeps edges 1-2 (5) and 2-3 (3), both directions
    val heavy = r.filter("e.weight > 2")
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(heavy == Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
    // the struct carries the ORIGINAL row in both match directions:
    // matching 2->1 still reports the stored direction's weight
    val back = r.filter($"a" === 2L && $"b" === 1L).head().getStruct(2)
    assert(back.getLong(2) == 5L)
    // attributed structs compose across multi-term patterns
    val wedge = Motif.find(tiny, "(a)-[e1]->(b); (b)-[e2]->(c)", we)
      .filter($"a" =!= $"c")
      .filter("e1.weight > 2 AND e2.weight > 2")
    // heavy wedges through the two heavy edges 1-2, 2-3: 1-2-3 and 3-2-1
    assert(wedge.count() == 2)
    // the real weighted co-purchase graph runs the same API at sf
    val g = GraphBuilder.coPurchase(spark, sf)
    val wre = GraphBuilder.weightedEdges(spark, sf)
    val n = Motif.find(g, "(a)-[e]->(b)", wre).filter("e.weight >= 2").count()
    val want = wre.filter($"weight" >= 2).count() * 2
    assert(n == want)
  }

  test("a Graph carrying attributed edges binds them through 2-arg find") {
    // GraphFrames' actual API shape: the graph OWNS its edge attributes;
    // find(g, pattern) binds the full struct with no separate edge table
    val we = Seq((1L, 2L, 5L), (1L, 3L, 1L), (2L, 3L, 3L), (3L, 4L, 2L))
      .toDF("src", "dst", "weight")
    val ag = Graph(GraphBuilder.vertices(we.select("src", "dst")), we)
    val r = Motif.find(ag, "(a)-[e]->(b)")
    assert(r.schema("e").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("src", "dst", "weight"))
    val heavy = r.filter("e.weight > 2")
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(heavy == Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
    // the same attributed Graph still runs plain algorithms (projection
    // guards: GraphX build, degrees, triangles ignore the attr column)
    assert(ag.degrees.count() == 4)
    assert(graft.graph.Gx.connectedComponents(ag)
      .select("component").distinct().count() == 1)
    // attribute-free graphs keep the plain (src, dst) struct
    val plain = Motif.find(tiny, "(a)-[e]->(b)")
    assert(plain.schema("e").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("src", "dst"))
  }

  test("anonymous vertices bind nothing and emit no columns") {
    val r = Motif.find(tiny, "()-[]->(b)")
    assert(r.columns.toSeq == Seq("b"))
    // every vertex with degree >= 1 appears once per incident edge
    assert(r.count() == 8)
  }

  test("disconnected pattern is a cross join") {
    val n = Motif.find(tiny, "(a)-[]->(b); (c)-[]->(d)").count()
    assert(n == 64) // 8 x 8 directed matches
  }

  test("standalone vertex term enumerates all vertices") {
    val r = Motif.find(tiny, "(a)").as[Long].collect().toSet
    assert(r == Set(1L, 2L, 3L, 4L))
  }

  test("negation on unbound vertices is rejected") {
    intercept[IllegalArgumentException] {
      Motif.find(tiny, "!(a)-[]->(b)")
    }
    intercept[IllegalArgumentException] {
      Motif.find(tiny, "(a)-[x]->(b); !(a)-[y]->(b)")
    }
  }

  test("motif open-wedge query equals degree-based closed-form") {
    // per center b of the small-parts induced subgraph: ordered (a, c)
    // pairs of distinct neighbors minus wedges closed by an a-c edge
    // = deg(b)·(deg(b)−1) − 2·tri(b)
    val g = GraphBuilder.coPurchase(spark, sf)
    val keep = Tables(spark, sf).part
      .filter(col("p_size") <= 10)
      .select(col("p_partkey").as("id"))
    val sub = Graph(keep, g.inducedSubgraphEdges(keep))
    val expected = sub.triangleVertexCounts
      .select(col("id"), (col("degree") * (col("degree") - 1) -
        lit(2) * col("triangles")).as("w"))
      .filter(col("w") > 0)
      .as[(Long, Long)].collect().toMap
    val got = graft.graph.GraphQueries.motifOpenWedges(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }
}
