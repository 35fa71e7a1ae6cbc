package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** (payload binary, stride int) → string: every stride-th byte of the
  * payload reassembled as a string — the byte-domain "nearest-neighbor
  * downsample" of [[graft.operators.Multimodal.byteResize]].
  *
  * Why native: the HOF formulation (`transform(sequence(...), s ->
  * decode(substring(payload, s+1, 1), 'UTF-8'))` + array_join) routes
  * every BYTE through the interpreted lambda path with a per-element
  * string allocation — measured seconds at sf0.1. This is one compiled
  * loop and one output allocation per row. Byte-identical for the
  * ASCII payloads the synthetic corpus carries (and byte-exact in
  * general: it strides BYTES, which is the operator's semantics). */
case class ByteStride(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val payload = a.asInstanceOf[Array[Byte]]
    val stride = b.asInstanceOf[Int]
    val n = payload.length
    val out = new Array[Byte]((n + stride - 1) / stride)
    var i = 0
    var j = 0
    while (i < n) {
      out(j) = payload(i)
      j += 1
      i += stride
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ByteStride = copy(left = l, right = r)
}

/** payload binary → 64-char '0'/'1' string: the average-hash (aHash)
  * of the byte stream. The payload is cut into 64 contiguous buckets
  * (bucket(t) = t·64 / L, integer division); bit b is 1 iff bucket b's
  * byte mean strictly exceeds the whole-payload mean. This is the
  * byte-domain skeleton of perceptual image hashing (aHash compares
  * 8×8 downsampled luma cells against the frame mean) — a real decoder
  * would feed pixel luma instead of raw bytes, everything downstream
  * (bucketing, mean compare, hash grouping) is unchanged.
  *
  * Deterministic by construction: the mean comparison cross-multiplies
  * exact integer sums (s_b·L > S·c_b) — no floats anywhere, so any
  * engine reproduces the hash bit-for-bit. Long math is safe while
  * 255·L² < 2⁶³ (L ≤ ~190 MB); larger payloads take the BigInt branch.
  *
  * Why native: per-byte bucket accumulation through interpreted HOF
  * lambdas allocates per element; this is one compiled loop + two
  * 64-long arrays per row (same rationale as [[ByteStride]]). */
case class AvgHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any): Any = {
    val p = a.asInstanceOf[Array[Byte]]
    val L = p.length
    val out = new Array[Byte](64)
    java.util.Arrays.fill(out, '0'.toByte)
    if (L > 0) {
      val s = new Array[Long](64)
      val c = new Array[Long](64)
      var total = 0L
      var t = 0
      while (t < L) {
        val b = (t.toLong * 64 / L).toInt
        val v = p(t) & 0xff
        s(b) += v; c(b) += 1; total += v
        t += 1
      }
      var b = 0
      if (L <= 190000000) {
        while (b < 64) {
          if (s(b) * L > total * c(b)) out(b) = '1'.toByte
          b += 1
        }
      } else {
        val lt = BigInt(L); val tt = BigInt(total)
        while (b < 64) {
          if (BigInt(s(b)) * lt > tt * c(b)) out(b) = '1'.toByte
          b += 1
        }
      }
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(c: Expression): AvgHash64 =
    copy(child = c)
}

object ByteColumns {
  def byteStride(payload: Column, stride: Column): Column =
    column(ByteStride(expression(payload), expression(stride)))
  def avgHash64(payload: Column): Column =
    column(AvgHash64(expression(payload)))
}
