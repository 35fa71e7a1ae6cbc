package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Ann
import org.apache.spark.sql.functions._

/** Dev probe 2: dump the residual micro-ints (vec_id, i, rxi). */
object ProbeIvfPq2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/probe_ivfpq2")
    val spark = GraftSession.get("probe-ivfpq2", 8)
    val (centroids, assigned, _, _) = Ann.ivfpqIndex(spark, dir)
    val emb = Tables(spark, dir).embeddings
    emb.join(assigned, "vec_id")
      .join(broadcast(centroids), "cell")
      .select(col("vec_id"), posexplode(zip_with(col("embedding"), col("centroid"),
        (x, c) => x.cast("double") - c.cast("double"))).as(Seq("pos", "rx")))
      .select(col("vec_id"), col("pos"),
        col("rx"), round(col("rx") * 1e6).cast("long").as("rxi"))
      .write.mode("overwrite").parquet(out)
    println("[probe] dumped " + out)
  }
}
