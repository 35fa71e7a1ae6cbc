package graft

import graft.operators.Bpe
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("merge table is well-formed, deterministic, duplicate-free") {
    val m = Bpe.bpeMerges(spark, sf).as[(Int, String, String)].collect()
    assert(m.length == 16)
    assert(m.map(_._1).toSeq == (1 to 16))
    m.foreach { case (_, pair, merged) =>
      assert(pair.startsWith("_") && pair.contains(" _"), pair)
      assert(merged == pair.replace(" _", ""))
    }
    assert(m.map(_._2).distinct.length == 16, "a pair was learned twice")
    val again = Bpe.bpeMerges(spark, sf).as[(Int, String, String)].collect()
    assert(m.sameElements(again))
  }

  test("dict encoding equals an independent replay of the merge rules") {
    val (merges, dict) = Bpe.train(spark, sf, 16)
    assert(dict.nonEmpty)
    dict.foreach { case (w, nSym) =>
      var s = "_" + w.split("").mkString(" _")
      merges.foreach { case (_, p, m) => s = s.replace(p, m) }
      assert(s.split(" ").length == nSym,
        s"word '$w': replay '$s' vs n_sym $nSym")
    }
  }

  test("bpe token counts equal a per-doc replay through the dict") {
    val (_, dict) = Bpe.train(spark, sf, 16)
    val nSym = dict.toMap
    val docs = Tables(spark, sf).documents
      .select("doc_id", "text").as[(Long, String)]
      .collect().take(25)
    val got = Bpe.bpeTokenCounts(spark, sf).as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      val expect = text.split(" ", -1).map(nSym(_).toLong).sum
      assert(got(id) == expect, s"doc $id: ${got(id)} vs $expect")
    }
  }

  test("every word encodes to between 1 and its character count symbols") {
    val (_, dict) = Bpe.train(spark, sf, 16)
    dict.foreach { case (w, n) =>
      assert(n >= 1 && n <= math.max(w.length, 1), s"$w -> $n symbols")
    }
  }
}
