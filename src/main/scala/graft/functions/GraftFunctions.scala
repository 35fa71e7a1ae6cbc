package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL surface for the native expressions: after `register(spark)`,
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works — the same operators
  * are reachable from the DataFrame API, SQL, and (via the registry)
  * views or thrift-server clients.
  */
object GraftFunctions {

  private def one(name: String)(f: Expression => Expression)
                 (implicit spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => f(exprs.head), "built-in")

  def register(session: SparkSession): Unit = {
    implicit val spark: SparkSession = session
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    one("minhash_sig")(e => MinHashSignature(e, numPerm = 128, seed = 42L))
    one("simhash64")(e => SimHash64(e, seed = 42L))
    one("hyperplane_lsh")(e => HyperplaneLsh(e, nBits = 48, seed = 42L))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "equal_fraction", exprs => EqualFraction(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sorted", exprs => JaccardSorted(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedLongIntersectCount(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kth_absent", exprs => KthAbsent(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_stride", exprs => ByteStride(exprs(0), exprs(1)), "built-in")
    one("avg_hash64")(e => AvgHash64(e))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "n2v_pick",
      exprs => Node2vecPick(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
  }
}
