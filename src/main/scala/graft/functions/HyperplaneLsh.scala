package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** array<float> → long: random-hyperplane (sign-random-projection) LSH
  * signature. Bit i = sign of ⟨v, r_i⟩ with r_i ∈ {−1,+1}^dim drawn
  * deterministically from `seed`. P[bit match] = 1 − θ/π, the SimHash
  * bound for cosine similarity.
  *
  * One compiled loop per row (nBits×dim fused multiply-adds) — the
  * zip_with/aggregate composition this replaces evaluated every element
  * through the interpreted expression path.
  */
case class HyperplaneLsh(child: Expression, nBits: Int, seed: Long,
                         portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 64, "signature must fit one long")
  override def dataType: DataType = LongType

  // plane matrix is tiny (nBits × dim booleans); built once per executor.
  // Portable mode derives entry (b, i) from the first md5 nibble of
  // "b_i" — `('0x' || substr(md5(b || '_' || i), 1, 1))::INT >= 8` in
  // SQL — so signatures (and the LSH candidate set) reproduce exactly
  // in any engine; seeded-Random mode remains for Spark-only flows.
  @transient private lazy val planes: Array[Array[Float]] =
    if (portable) {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(nBits, 4096) { (b, i) =>
        md.reset()
        val d = md.digest(s"${b}_$i".getBytes("UTF-8"))
        if (((d(0) & 0xFF) >>> 4) >= 8) 1.0f else -1.0f
      }
    } else {
      val rng = new java.util.Random(seed)
      Array.fill(nBits, 4096)(if (rng.nextBoolean()) 1.0f else -1.0f)
    }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n <= 4096,
      s"hyperplane_lsh supports vectors up to 4096 dims, got $n " +
        "(silent truncation would ignore the tail)")
    var sig = 0L
    var b = 0
    while (b < nBits) {
      val plane = planes(b)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += x.getFloat(i) * plane(i)
        i += 1
      }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneLsh =
    copy(child = c)
}

object HyperplaneLsh {
  def hyperplaneLsh(v: Column, nBits: Int = 48, seed: Long = 42L,
                    portable: Boolean = false): Column =
    column(HyperplaneLsh(expression(v), nBits, seed, portable))
}
