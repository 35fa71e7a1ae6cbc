package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: intersection of two SORTED long arrays
  * by linear merge.
  *
  * This is the inner kernel of the triangle pipeline — evaluated once
  * per edge over the degree-ordered adjacency arrays, Σ(deg⁺(u)+deg⁺(v))
  * total element visits. The builtin `array_intersect` hashes one side
  * per row (boxed longs through an OpenHashSet); the merge walk is two
  * primitive cursors with no allocation beyond the result, and the
  * generated code stays inside whole-stage codegen.
  *
  * PRECONDITION: both inputs ascending-sorted (the adjacency builder
  * uses sort_array). Duplicate elements follow `array_intersect` set
  * semantics: equal runs are skipped, so each common value appears once
  * in the output regardless of input multiplicity. Output is ascending —
  * a superset of the guarantees consumers rely on (they count, explode
  * into aggregates, or set-compare).
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isLongArray(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"expected (array<bigint>, array<bigint>), got " +
          s"(${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersect.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedLongIntersect.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersect {
  /** Shared by interpreted and generated paths. */
  def compute(x: ArrayData, y: ArrayData): ArrayData = {
    val n = x.numElements()
    val m = y.numElements()
    val out = new Array[Long](math.min(n, m))
    var i = 0
    var j = 0
    var k = 0
    while (i < n && j < m) {
      val a = x.getLong(i)
      val b = y.getLong(j)
      if (a < b) i += 1
      else if (a > b) j += 1
      else {
        out(k) = a; k += 1
        // Set semantics (match array_intersect): skip the full equal run
        // on both sides so duplicated inputs never emit duplicates.
        do i += 1 while (i < n && x.getLong(i) == a)
        do j += 1 while (j < m && y.getLong(j) == a)
      }
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }

  /** Column-level entry point; both columns must be ascending-sorted. */
  def sortedIntersect(a: Column, b: Column): Column =
    column(SortedLongIntersect(expression(a), expression(b)))
}
