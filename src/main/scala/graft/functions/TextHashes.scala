package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hashing expressions for the dedup pipeline.
  *
  * Why not higher-order functions: Spark's `aggregate`/`transform`/
  * `zip_with` evaluate their lambda per element through the interpreted
  * expression path (boxing every step) — measured 25× slower than a
  * compiled loop for 128-permutation MinHash. These expressions run one
  * compiled Scala loop per row instead. They use `CodegenFallback` (one
  * virtual call per row); the loops themselves are JIT-compiled.
  *
  * MinHash uses the standard universal-hashing construction (as MLlib's
  * MinHashLSH): ONE xxhash64 per token, then k affine transforms
  * h_i = a_i·h + b_i with fixed odd multipliers — k× fewer strong-hash
  * evaluations with the same collision behavior.
  */
object TextHashes {

  private[functions] def tokenHash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** ENGINE-PORTABLE 28-bit token hash: the first 7 hex digits of
    * md5(token) — exactly `conv(substr(md5(tok), 1, 7), 16, 10)` in any
    * SQL engine, so MinHash signatures built on it reproduce bit-for-bit
    * outside Spark (the DuckDB oracle, or another dedup system sharing
    * sketches). 28 bits keeps the Carter–Wegman transform below 2⁶³. */
  private[functions] def tokenHashPortable(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 7 hex nibbles: bytes 0,1,2 and the high nibble of byte 3
    ((d(0) & 0xFFL) << 20) | ((d(1) & 0xFFL) << 12) |
      ((d(2) & 0xFFL) << 4) | ((d(3) & 0xFFL) >>> 4)
  }

  private val PortablePrime = 2147483647L // 2^31 - 1

  /** Deterministic portable coefficients: both the Spark expression and
    * the SQL oracle derive them from the permutation index alone.
    * a_j < 2^30 and h < 2^28 ⇒ a·h + b < 2^59: no 64-bit overflow on
    * either engine. */
  private[functions] def portableCoeff(j: Int): (Long, Long) = {
    val a = ((j + 1L) * 2654435761L) % 1073741823L + 1L
    val b = ((j + 1L) * 40503L * 65537L) % PortablePrime
    (a, b)
  }

  private[functions] def portablePerm(a: Long, b: Long, h: Long): Long =
    (a * h + b) % PortablePrime

  /** Portable 64-bit token hash: the first 16 hex digits of md5(token)
    * as a big-endian long — `('0x' || substr(md5(tok), 1, 16))::UBIGINT`
    * in SQL (bit patterns agree; signedness never leaves the engine). */
  private[functions] def tokenHash64Portable(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
  }

  /** Deterministic affine coefficients shared by all rows. */
  private[functions] def coeffs(numPerm: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rng = new java.util.Random(seed)
    val a = Array.fill(numPerm)(rng.nextLong() | 1L) // odd multiplier
    val b = Array.fill(numPerm)(rng.nextLong())
    (a, b)
  }
}

/** array<string> → array<long>: k-permutation MinHash signature of the
  * DISTINCT element set (duplicated tokens cannot change a min).
  *
  * `portable = true` switches the base hash to the md5-derived 28-bit
  * value and the permutations to (a·h + b) mod 2³¹−1 with
  * index-derived coefficients — bit-identical reproducible in plain
  * SQL (see [[TextHashes.tokenHashPortable]]); xxhash64 mode stays for
  * Spark-only flows where hash throughput dominates. */
case class MinHashSignature(child: Expression, numPerm: Int, seed: Long,
                            portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val (ca, cb) =
    if (portable) {
      val cs = (0 until numPerm).map(TextHashes.portableCoeff)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    } else TextHashes.coeffs(numPerm, seed)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (portable) {
          val h = TextHashes.tokenHashPortable(s)
          var j = 0
          while (j < numPerm) {
            val hj = TextHashes.portablePerm(ca(j), cb(j), h)
            if (hj < sig(j)) sig(j) = hj
            j += 1
          }
        } else {
          val h = TextHashes.tokenHash(s, seed)
          var j = 0
          while (j < numPerm) {
            val hj = ca(j) * h + cb(j)
            if (hj < sig(j)) sig(j) = hj
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** array<string> → long: 64-bit SimHash over the token multiset.
  * Portable mode uses the md5-derived 64-bit token hash so signatures
  * (and hamming-band candidate pairs) reproduce in plain SQL. */
case class SimHash64(child: Expression, seed: Long,
                     portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = if (portable) TextHashes.tokenHash64Portable(s)
                else TextHashes.tokenHash(s, seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sim |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sim)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** (array<long>, array<long>) → double: fraction of positions equal —
  * the MinHash Jaccard estimator. */
case class EqualFraction(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) return java.lang.Double.valueOf(0.0)
    var eq = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    java.lang.Double.valueOf(eq.toDouble / n)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): EqualFraction = copy(left = l, right = r)
}

/** (array<string> SORTED+DISTINCT, same) → double: exact Jaccard via a
  * linear merge-walk — no hash sets, no interpreted per-element lambda.
  * Caller must pre-sort (array_sort ∘ array_distinct, both native). */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    java.lang.Double.valueOf(if (union == 0) 0.0 else inter.toDouble / union)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaccardSorted = copy(left = l, right = r)
}

/** (array<long> SORTED, array<long> SORTED) → long: size of the
  * intersection via linear merge-walk. Used for common-neighbor counts
  * on sorted adjacency arrays. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(inter)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedLongIntersectCount =
    copy(left = l, right = r)
}

object HashColumns {
  def sortedLongIntersectCount(a: Column, b: Column): Column =
    column(SortedLongIntersectCount(expression(a), expression(b)))
  def minhashSig(tokens: Column, numPerm: Int = 128, seed: Long = 42L,
                 portable: Boolean = false): Column =
    column(MinHashSignature(expression(tokens), numPerm, seed, portable))
  def simhash64(tokens: Column, seed: Long = 42L,
                portable: Boolean = false): Column =
    column(SimHash64(expression(tokens), seed, portable))
  def equalFraction(a: Column, b: Column): Column =
    column(EqualFraction(expression(a), expression(b)))
  def jaccardSorted(a: Column, b: Column): Column =
    column(JaccardSorted(expression(a), expression(b)))
}
