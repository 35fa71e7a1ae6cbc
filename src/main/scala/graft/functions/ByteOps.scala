package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

object ByteColumns {
  def byteStride(payload: Column, stride: Column): Column =
    column(ByteStride(expression(payload), expression(stride)))
}
