package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** Native expressions for the speculative-coloring loop
  * ([[graft.graph.Iterative.greedyColoring]]).
  *
  * The load-bearing trick: the vertex priority is a pure function of
  * the id (first 8 hex digits of md5("jp:" || id)), so any neighbor's
  * priority is computable IN PLACE from the adjacency array — rank
  * seeding and conflict ordering never join a priority table. */
object ColoringOps {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** h(id): matches conv(substring(md5('jp:'||id), 1, 8), 16, 10) —
    * the first 4 digest bytes as an unsigned big-endian 32-bit value. */
  private[functions] def pri(id: Long): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(("jp:" + id).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** Strict priority order: (h(a), a) > (h(b), b). */
  private[functions] def higher(a: Long, b: Long): Boolean = {
    val ha = pri(a)
    val hb = pri(b)
    ha > hb || (ha == hb && a > b)
  }
}

/** (id long) → long: the md5 vertex priority, one compiled digest per
  * row (the SQL-function formulation is also fine — this exists so the
  * sibling array expressions share one definition). */
case class JpPriority(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(ColoringOps.pri(v.asInstanceOf[Long]))
  override protected def withNewChildInternal(c: Expression): JpPriority =
    copy(child = c)
}

/** (nbrs array<long>, id long) → long: #neighbors with strictly higher
  * (h, id) priority — the initial speculative-coloring rank, computed
  * from the adjacency array alone (one md5 per neighbor, compiled). */
case class CountHigherPri(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val nbrs = a.asInstanceOf[ArrayData]
    val id = b.asInstanceOf[Long]
    val n = nbrs.numElements()
    var i = 0
    var c = 0L
    while (i < n) {
      if (ColoringOps.higher(nbrs.getLong(i), id)) c += 1
      i += 1
    }
    java.lang.Long.valueOf(c)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CountHigherPri = copy(left = l, right = r)
}

/** (used SORTED array<long> (dups ok), k long) → long: the (k+1)-th
  * smallest non-negative integer absent from `used` — the rank-offset
  * color pick, replacing the candidate-explode + anti-join + window
  * formulation with an O(|used| + k) row-local walk. */
case class KthAbsent(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val used = a.asInstanceOf[ArrayData]
    val k = b.asInstanceOf[Long]
    val n = used.numElements()
    var j = 0
    var remaining = k
    var c = 0L
    while (true) {
      while (j < n && used.getLong(j) < c) j += 1
      if (j < n && used.getLong(j) == c) { j += 1 } // present: skip (and dups)
      else if (remaining == 0L) return java.lang.Long.valueOf(c)
      else remaining -= 1
      c += 1
    }
    java.lang.Long.valueOf(-1L) // unreachable
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KthAbsent = copy(left = l, right = r)
}

object ColoringColumns {
  def jpPriority(id: Column): Column = column(JpPriority(expression(id)))
  def countHigherPri(nbrs: Column, id: Column): Column =
    column(CountHigherPri(expression(nbrs), expression(id)))
  def kthAbsent(used: Column, k: Column): Column =
    column(KthAbsent(expression(used), expression(k)))
}
