package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** One-pass co-moment (covariance-matrix) aggregate over an
  * `array<float>` embedding column.
  *
  * Scale rationale: the covariance of a d-dim column needs Σxᵢ, Σxᵢxⱼ
  * and n — O(d²) state, INDEPENDENT of corpus size. The naive plans
  * either self-join the exploded (vec_id, dim, x) table on vec_id (a
  * full shuffle of n×d rows with d² fan-out) or explode every row into
  * d(d+1)/2 pair rows before aggregating (map-side, but n×2080
  * interpreted struct allocations for d=64). This
  * `TypedImperativeAggregate` keeps ONE long array of d(d+1)/2 + d + 2
  * entries per partition (≈17 KB at d=64), updates it with a primitive
  * multiply-add loop per row, and ships only the per-partition sketches
  * to the single reducer — the same bounded-sketch shape as
  * [[TopKByScore]]. At 1000 executors the shuffle is (#tasks × 17 KB).
  *
  * Determinism: inputs are quantized to 1e-3 (`round half away from
  * zero`, DuckDB's and Spark SQL's shared convention), so every sum and
  * product is EXACT integer arithmetic in any partial-aggregation
  * order and in any engine. The emitted `cov_micro` is the MICRO
  * covariance `(n·Σxy − Σx·Σy) / n²` = cov·1e6 — exact integers
  * divided once (< 2⁵³ at test scales, so the int→double conversions
  * are exact); callers divide by 1e6 and pin with `round(…, 6)`,
  * reproducing the oracle's operation order exactly. The 1e-3 input
  * quantization bounds the
  * covariance error by ~1e-3·σ, documented as part of the operator
  * contract (the oracle applies the identical quantization).
  *
  * State overflow bound: |Σxᵢxⱼ| ≤ n · (qmax)² where qmax ≈ |x|ₘₐₓ·10³;
  * for |x| ≤ 4 that is n·1.6e7 — Long-safe past 5e11 rows (a 100 TB
  * corpus at 256 B/row is ~4e11).
  */
case class CoMoments(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // layout: [n, d, sx(0..d-1), sxy(upper triangle row-major)]
  // empty (length 0) = uninitialized; d fixed by the first row seen.
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def roundHalfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  private def alloc(d: Int): Array[Long] = new Array[Long](2 + d + d * (d + 1) / 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.length == 0) { val nb = alloc(d); nb(1) = d; nb } else buf
    require(b(1) == d, s"CoMoments: ragged embedding width ${b(1)} vs $d")
    val mx = new Array[Long](d)
    var i = 0
    while (i < d) { mx(i) = roundHalfAway(arr.getFloat(i) * 1000.0); i += 1 }
    b(0) += 1
    var off = 2 + d
    i = 0
    while (i < d) {
      b(2 + i) += mx(i)
      val mi = mx(i)
      var j = i
      while (j < d) { b(off) += mi * mx(j); off += 1; j += 1 }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      require(a(1) == b(1), "CoMoments: merging different widths")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a(1) = b(1) // d is not additive
      a
    }

  override def eval(buf: Array[Long]): Any = {
    if (buf.length == 0) return new GenericArrayData(Array.empty[Any])
    val n = buf(0)
    val d = buf(1).toInt
    val nBig = BigInt(n)
    val den = (nBig * nBig).toDouble
    val rows = new Array[Any](d * (d + 1) / 2)
    var off = 2 + d
    var r = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val num = nBig * BigInt(buf(off)) - BigInt(buf(2 + i)) * BigInt(buf(2 + j))
        rows(r) = InternalRow(i, j, num.toDouble / den)
        off += 1; r += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("cov_micro", DoubleType, nullable = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CoMoments =
    copy(child = c(0))
  override def withNewMutableAggBufferOffset(o: Int): CoMoments =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CoMoments =
    copy(inputAggBufferOffset = o)
}

object CoMoments {
  /** Aggregate Column: array<struct<i,j,cov_micro>> — the
    * upper-triangle micro-covariance (cov·1e6) of an `array<float>`
    * column (1e-3-quantized inputs). */
  def coMoments(vec: Column): Column =
    Bridge.column(CoMoments(Bridge.expression(vec)).toAggregateExpression())
}
