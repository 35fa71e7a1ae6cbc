package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-minhash", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = Tables(spark, dir).documents
    println("[prof] docs: " + docs.count())
    val sigs = t("signatures") {
      val s = Dedup.minhashSignatures(docs).localCheckpoint(true)
      println("[prof] sig rows: " + s.count()); s
    }
    val banded = t("banding") {
      val numPerm = 128; val bands = 8; val rowsPerBand = numPerm / bands
      val b = sigs.select(col("doc_id"), posexplode(
        array((0 until bands).map { bb =>
          xxhash64(lit(bb) +: (0 until rowsPerBand)
            .map(r => element_at(col("sig"), bb * rowsPerBand + r + 1)): _*)
        }: _*)).as(Seq("band", "bucket"))).localCheckpoint(true)
      println("[prof] banded rows: " + b.count()); b
    }
    t("bucket-stats") {
      banded.groupBy("band", "bucket").count()
        .agg(max("count"), avg("count"), sum(col("count") * col("count")))
        .show()
    }
    val cand = t("pair-join") {
      val l = banded.select(col("band"), col("bucket"), col("doc_id").as("a"))
      val r = banded.select(col("band"), col("bucket"), col("doc_id").as("b"))
      val c = l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
        .select("a", "b").distinct().localCheckpoint(true)
      println("[prof] candidate pairs: " + c.count()); c
    }
    t("est-jaccard") {
      val n = cand
        .join(sigs.select(col("doc_id").as("a"), col("sig").as("sig_a")), "a")
        .join(sigs.select(col("doc_id").as("b"), col("sig").as("sig_b")), "b")
        .select(col("a"), col("b"),
          (size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _),
            x => x)) / lit(128.0)).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.8).count()
      println("[prof] pairs >= 0.8: " + n)
    }
    spark.stop()
  }
}
