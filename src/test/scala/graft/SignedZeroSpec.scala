package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the signed-zero contract between the engine and the DuckDB
  * oracles (the round-7 `e_embedding_covariance` flake: all values
  * equal, hash red, because DuckDB's `round(x, 6)` returns `-0.0` for
  * tiny negative inputs while Spark's returns `+0.0`, and the driver's
  * hash is bit-sensitive).
  *
  * The repo-wide idiom, after the round-8 sweep:
  *   - Exact-integer outputs wherever the value is already carried as
  *     micro-units (`e_embedding_covariance` emits BIGINT `cov_micro`;
  *     integers have no signed zero).
  *   - For rounded DOUBLE oracles whose value can be a tiny negative
  *     (assortativity, community assortativity, NMI, silhouette,
  *     qoq growth, densification slope): the DuckDB SQL appends
  *     `+ 0.0` after `round(...)` — IEEE-754 `-0.0 + 0.0 = +0.0`, a
  *     no-op on every other value. The Spark side needs NO mirror
  *     because Spark's `round` on DoubleType goes through BigDecimal,
  *     which has no signed zero (asserted below) — a one-sided
  *     normalization can therefore never break a previously-green
  *     match.
  */
class SignedZeroSpec extends AnyFunSuite {
  import SparkTestSession._

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("Spark round() never emits -0.0: tiny negatives round to +0.0") {
    val vals = Seq(-1e-9, -4.9e-7, -0.0, 0.0, -1e-300)
    val got = spark.range(1).select(
        vals.zipWithIndex.map { case (v, i) => round(lit(v), 6).as(s"c$i") }: _*)
      .head()
    vals.indices.foreach { i =>
      val d = got.getDouble(i)
      assert(bits(d) == bits(0.0), s"round(${vals(i)}, 6) -> $d has sign bit")
    }
  }

  test("x + 0.0 normalizes -0.0 to +0.0 and is a no-op elsewhere (IEEE)") {
    // engine-independent IEEE-754 semantics — the same arithmetic the
    // `round(...) + 0.0` oracle idiom relies on inside DuckDB
    assert(bits(-0.0 + 0.0) == bits(0.0))
    assert(bits(0.0 + 0.0) == bits(0.0))
    assert(bits(-1.5 + 0.0) == bits(-1.5))
    assert(bits(4.9e-7 + 0.0) == bits(4.9e-7))
    val got = spark.range(1)
      .select((lit(-0.0) + lit(0.0)).as("z"), (lit(-2.25) + lit(0.0)).as("n"))
      .head()
    assert(bits(got.getDouble(0)) == bits(0.0))
    assert(bits(got.getDouble(1)) == bits(-2.25))
  }

  test("embeddingCovariance emits exact BIGINT micro-units (no double column)") {
    val df = graft.operators.Ann.embeddingCovariance(spark, sf)
    val f = df.schema("cov_micro")
    assert(f.dataType == org.apache.spark.sql.types.LongType, f.dataType)
  }

  test("negative-capable rounded oracles carry the + 0.0 normalization") {
    val negCapable = Seq("g_assortativity", "g_community_assortativity",
      "g_community_nmi", "e_silhouette", "q_qoq_growth", "g_densification")
    negCapable.foreach { q =>
      val sql = SparkEntry.oracleSql(q)
      assert(sql.contains("+ 0.0"), s"$q oracle lacks the + 0.0 idiom")
    }
    // the covariance oracle is integer-typed instead — stronger
    assert(SparkEntry.oracleSql("e_embedding_covariance")
      .contains("AS BIGINT) AS cov_micro"))
  }
}
