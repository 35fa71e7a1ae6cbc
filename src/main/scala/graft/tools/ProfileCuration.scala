package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Curation, Dedup}

/** Where does d_curation_pipeline's first-touch go? Splits the LSH pair
  * cache, the CC labels, and the decision query itself. */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-curation", 32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = Tables(spark, dir).documents
    t("minhash signatures only") {
      Dedup.minhashSignatures(docs).write.format("noop").mode("overwrite").save()
    }
    t("cachedMinhashPairs first touch") {
      Dedup.cachedMinhashPairs(dir, docs, 0.8).count()
    }
    t("nearDupComponents (GraphX CC) first touch") {
      Dedup.nearDupComponents(spark, docs, dir).count()
    }
    t("curationDecisions end-to-end") {
      Curation.curationDecisions(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
  }
}
