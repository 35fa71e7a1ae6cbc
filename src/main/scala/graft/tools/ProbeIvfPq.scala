package graft.tools

import graft.GraftSession
import graft.operators.Ann
import org.apache.spark.sql.functions._

/** Dev probe: dump every IVF-PQ training intermediate so the DuckDB
  * oracle CTEs can be bisected stage by stage against the engine. */
object ProbeIvfPq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/probe_ivfpq")
    val spark = GraftSession.get("probe-ivfpq", 8)
    val (centroids, assigned, cb, enc) = Ann.ivfpqIndex(spark, dir)
    assigned.orderBy("vec_id")
      .write.mode("overwrite").parquet(s"$out/assigned")
    centroids.select(col("cell"), posexplode(col("centroid")).as(Seq("pos", "c")))
      .orderBy("cell", "pos")
      .write.mode("overwrite").parquet(s"$out/centroids")
    cb.select(col("m"), col("code"), posexplode(col("centroid")).as(Seq("j", "c")))
      .orderBy("m", "code", "j")
      .write.mode("overwrite").parquet(s"$out/cb")
    enc.orderBy("vec_id", "m")
      .write.mode("overwrite").parquet(s"$out/enc")
    println("[probe] dumped to " + out)
  }
}
