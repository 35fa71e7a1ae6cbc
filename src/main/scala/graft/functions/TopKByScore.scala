package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Bounded top-k aggregate: keeps the k highest-scoring (id, score)
  * pairs per group in a size-k heap.
  *
  * Scale rationale: the naive top-k-per-group plan (`row_number` over a
  * window, filter ≤ k) shuffles EVERY scored row to the group's
  * reducer — |corpus| × |queries| rows for ANN. This aggregate is a
  * `TypedImperativeAggregate`, so Spark runs it map-side first: each
  * task reduces its slice to ≤ k rows per group and only those k-row
  * sketches shuffle. State per group is O(k), independent of corpus
  * size.
  *
  * Deterministic: score ties broken by smaller id on keep, output sorted
  * (score desc, id asc).
  */
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Double)]] {

  // "worst" entry (lowest score, then largest id) is the heap head
  private val evictOrd: Ordering[(Long, Double)] =
    new Ordering[(Long, Double)] {
      override def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty[(Long, Double)](evictOrd)

  override def update(buf: mutable.PriorityQueue[(Long, Double)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Double)] = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null) {
      val entry = (id.asInstanceOf[Long], score.asInstanceOf[Double])
      if (buf.size < k) buf.enqueue(entry)
      else if (evictOrd.compare(entry, buf.head) < 0) { // strictly better
        buf.dequeue(); buf.enqueue(entry)
      }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Long, Double)],
                     b: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    b.foreach { e =>
      if (a.size < k) a.enqueue(e)
      else if (evictOrd.compare(e, a.head) < 0) { a.dequeue(); a.enqueue(e) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Double)]): Any = {
    val sorted = buf.toArray.sortBy(t => (-t._2, t._1))
    new GenericArrayData(sorted.map(t => InternalRow(t._1, t._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (id, s) => out.writeLong(id); out.writeDouble(s) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readLong(), in.readDouble())))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScore =
    copy(idExpr = c(0), scoreExpr = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
}

object TopKByScore {
  /** Aggregate Column: array<struct<neighbor_id,score>> of the k best. */
  def topK(id: Column, score: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(id), Bridge.expression(score), k)
        .toAggregateExpression())
}
