package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** (nbrs SORTED array<long>, pnbrs SORTED array<long>, prev long,
  * draw long) → long: the node2vec second-order step choice in one
  * compiled merge-walk.
  *
  * Semantics (bit-identical to the unrolled SQL oracle and to the
  * higher-order-function formulation it replaces): neighbor x of the
  * current vertex gets unnormalized integer weight 4 if x == prev
  * (return), 2 if x ∈ pnbrs (common neighbor of the previous vertex),
  * else 1 (outward) — i.e. p=1/2, q=2 scaled ×2. r = draw mod Σw, and
  * the chosen neighbor is the one whose inclusive cumulative-weight
  * range covers r (count of inclusive prefix sums ≤ r, 0-based).
  *
  * Why native: the lambda formulation evaluates `array_contains(pnbrs,
  * x)` per neighbor through the interpreted expression path — an
  * O(deg·deg) boxed scan per frontier row that dominated the walk step
  * (hub–hub steps are ~10⁶ interpreted ops). Both arrays arrive sorted
  * from [[graft.graph.Graph.collectNeighborIds]], so membership is a
  * linear merge carried alongside the cumulative sum: O(deg+deg) per
  * row, two passes (one for Σw, one for the pick), zero allocation. */
case class Node2vecPick(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  // null on an empty neighbor array even when all inputs are non-null
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val nbrs = a.asInstanceOf[ArrayData]
    val pn = b.asInstanceOf[ArrayData]
    val prev = c.asInstanceOf[Long]
    val draw = d.asInstanceOf[Long]
    val n = nbrs.numElements()
    // total function: a vertex with no neighbors has no pick (draw % 0
    // would throw). Unreachable from the symmetric-graph walk frontier
    // (prev is always a neighbor) but callers on directed/filtered
    // graphs must get null, not an ArithmeticException.
    if (n == 0) return null
    val np = pn.numElements()
    // pass 1: total weight, membership by merge (both sorted ascending)
    var tot = 0L
    var i = 0
    var j = 0
    while (i < n) {
      val x = nbrs.getLong(i)
      while (j < np && pn.getLong(j) < x) j += 1
      tot += (if (x == prev) 4L else if (j < np && pn.getLong(j) == x) 2L
              else 1L)
      i += 1
    }
    val r = draw % tot
    // pass 2: first index whose inclusive cumulative weight exceeds r
    var cum = 0L
    i = 0
    j = 0
    var picked = 0L
    var found = false
    while (i < n && !found) {
      val x = nbrs.getLong(i)
      while (j < np && pn.getLong(j) < x) j += 1
      cum += (if (x == prev) 4L else if (j < np && pn.getLong(j) == x) 2L
              else 1L)
      if (cum > r) { picked = x; found = true }
      i += 1
    }
    java.lang.Long.valueOf(picked)
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): Node2vecPick =
    copy(first = f, second = s, third = t, fourth = q)
}

object WalkColumns {
  def node2vecPick(nbrs: Column, pnbrs: Column, prev: Column,
                   draw: Column): Column =
    column(Node2vecPick(expression(nbrs), expression(pnbrs),
      expression(prev), expression(draw)))
}
