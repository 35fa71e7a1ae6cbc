package graft

import graft.graph.TriadCensus
import org.scalatest.funsuite.AnyFunSuite

class TriadSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("classifier pins the Holland-Leinhardt conventions") {
    // codes: 0 none, 1 low->high, 2 high->low, 3 mutual; args (cab, cac, cbc)
    assert(TriadCensus.classify(0, 0, 0) == "003")
    assert(TriadCensus.classify(1, 0, 0) == "012")
    assert(TriadCensus.classify(3, 0, 0) == "102")
    // b->a, b->c: diverge from b
    assert(TriadCensus.classify(2, 0, 1) == "021D")
    // a->b, c->b: converge on b
    assert(TriadCensus.classify(1, 0, 2) == "021U")
    // a->b, b->c: chain
    assert(TriadCensus.classify(1, 0, 1) == "021C")
    // a<->b plus c->a: third points INTO the mutual pair
    assert(TriadCensus.classify(3, 2, 0) == "111D")
    // a<->b plus a->c: pair points at the third
    assert(TriadCensus.classify(3, 1, 0) == "111U")
    // a->b, b->c, a->c: transitive
    assert(TriadCensus.classify(1, 1, 1) == "030T")
    // a->b, b->c, c->a: cycle
    assert(TriadCensus.classify(1, 2, 1) == "030C")
    assert(TriadCensus.classify(3, 3, 0) == "201")
    // b<->c plus a->b, a->c: 021D-diverge (from a) + closing mutual
    assert(TriadCensus.classify(1, 1, 3) == "120D")
    // b<->c plus b->a, c->a: converge + mutual
    assert(TriadCensus.classify(2, 2, 3) == "120U")
    // b<->c plus a->b, c->a: chain + mutual
    assert(TriadCensus.classify(1, 2, 3) == "120C")
    assert(TriadCensus.classify(3, 3, 1) == "210")
    assert(TriadCensus.classify(3, 3, 3) == "300")
    // every one of the 64 codes maps to one of the 16 names
    assert(TriadCensus.codeToType.values.toSet == TriadCensus.TriadTypes.toSet)
  }

  test("census equals a brute-force triple enumeration on random digraphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nV = 12 + trial * 3
      val edges = (for {
        s <- 0 until nV; d <- 0 until nV
        if s != d && rnd.nextDouble() < 0.18
      } yield (s.toLong + 1, d.toLong + 1)).distinct
      val got = TriadCensus.census(edges.toDF("src", "dst"))
        .as[(String, Long)].collect().toMap
      // brute force: classify every C(n,3) triple via the same codes
      val eset = edges.toSet
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      def code(x: Long, y: Long): Int =
        (if (eset.contains((x, y))) 1 else 0) + (if (eset.contains((y, x))) 2 else 0)
      val brute = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for {
        i <- verts.indices; j <- (i + 1) until verts.size
        k <- (j + 1) until verts.size
      } {
        val t = TriadCensus.classify(code(verts(i), verts(j)),
          code(verts(i), verts(k)), code(verts(j), verts(k)))
        brute(t) += 1
      }
      val bruteFull = TriadCensus.TriadTypes.map(t => t -> brute(t)).toMap
      assert(got == bruteFull, s"trial $trial")
      val n = verts.size.toLong
      assert(got.values.sum == n * (n - 1) * (n - 2) / 6)
    }
  }

  test("census on the real directed graph: complete, consistent with the dyad census") {
    val got = TriadCensus.census(spark, SparkTestSession.sf)
      .as[(String, Long)].collect()
    assert(got.map(_._1).toSeq == TriadCensus.TriadTypes)
    assert(got.forall(_._2 >= 0))
    val dc = graft.graph.GraphQueries.dyadCensus(spark, SparkTestSession.sf).head()
    val n = dc.getLong(0)
    assert(got.map(_._2).sum == n * (n - 1) * (n - 2) / 6)
  }
}
