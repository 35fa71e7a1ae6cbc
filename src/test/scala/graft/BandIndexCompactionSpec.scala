package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generation compaction of the persisted LSH band index (r11): the
  * cross-generation rep re-collapse runs entirely from stored index
  * state (no document re-read/re-sign), probe results are IDENTICAL
  * before and after, and the bucket-row growth that motivates the
  * nightly compaction really shrinks. */
class BandIndexCompactionSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Dedup

  private def text(tmpl: String): String =
    (0 until 20).map(j => s"$tmpl$j").mkString(" ")

  test("compaction: probe-identical, bucket rows shrink, global min rep") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-compact-band").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-compact-band-out").toString
    // template A spans BOTH generations (cross-gen rep group: each gen
    // collapses it separately — 2 bucket rows per band pre-compaction);
    // template B is gen-1-only, C gen-2-only
    val gen1 = Seq((10L, text("A")), (11L, text("A")), (20L, text("B")))
      .toDF("doc_id", "text")
    val gen2 = Seq((110L, text("A")), (120L, text("C")))
      .toDF("doc_id", "text")
    assert(Dedup.writeIndexGeneration(gen1, root) == 1L)
    assert(Dedup.writeIndexGeneration(gen2, root) == 2L)
    Dedup.compactIndexGenerations(spark, root, out)
    assert(Dedup.latestGeneration(spark, out) == 1L)
    // probe each template + a novel doc: the dup sets must be equal
    val probes = Seq((500L, text("A")), (501L, text("B")),
      (502L, text("C")), (503L, text("novel"))).toDF("doc_id", "text")
    def hits(r: String) = Dedup
      .deltaDupPairs(Dedup.loadBandIndexGenerations(spark, r), probes, 0.8)
      .select("delta_id", "base_id", "est_jaccard").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val before = hits(root)
    val after = hits(out)
    assert(before == after,
      s"probe diverged: only-before=${before.diff(after)}, " +
        s"only-after=${after.diff(before)}")
    // the A-probe must expand to BOTH generations' members either way
    assert(before.filter(_._1 == 500L).map(_._2) == Set(10L, 11L, 110L))
    // bucket rows shrink: A was rep-collapsed per generation (2 rows
    // per band), compaction folds it to one
    val idxB = Dedup.loadBandIndexGenerations(spark, root)
    val idxA = Dedup.loadBandIndexGenerations(spark, out)
    assert(idxA.buckets.count() < idxB.buckets.count(),
      "cross-generation dup group should shrink the bucket table")
    // the compacted rep of A's signature is the GLOBAL min doc id
    val aRep = Dedup.deltaDupPairs(idxA, Seq((600L, text("A")))
      .toDF("doc_id", "text"), 0.8)
      .select("base_id").collect().map(_.getLong(0)).toSet
    assert(aRep == Set(10L, 11L, 110L))
    assert(idxA.members.filter(col("doc_id") === 10L)
      .select("rep").head().getLong(0) == 10L)
  }

  test("compaction refuses an in-place rewrite") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-compact-band-self").toString
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.compactIndexGenerations(spark, p, p)
    }
  }
}
