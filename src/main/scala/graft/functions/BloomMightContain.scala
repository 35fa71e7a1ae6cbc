package graft.functions

import java.io.ByteArrayInputStream
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe against a pre-built
  * Bloom filter of the build side's join keys — the semi-join
  * reduction that turns a shuffle join into "filter the probe side
  * first, then join what's left".
  *
  * Why it matters at 100 TB: when only a few % of probe-side rows have
  * a matching build key, a plain shuffle join still shuffles EVERY
  * probe row. Pre-filtering with an m-bit Bloom sketch (built in one
  * pass over the much smaller build side, shipped to every task as a
  * plan constant) drops non-matching rows AT THE SCAN, before the
  * exchange — the same trick Spark's own runtime row-group filtering
  * plays, exposed here as an explicit operator. No false negatives, so
  * the exact join that follows returns exactly the plain-join result;
  * false positives only cost a little extra shuffle.
  *
  * Codegen: the deserialized filter is installed once per task via
  * `addReferenceObj`, so the per-row probe is a virtual call on a
  * primitive long inside whole-stage codegen — no boxing, no UDF
  * boundary.
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected BIGINT key, got ${child.dataType}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-level entry point: `mightContain(bf, $"key")`. */
  def mightContain(bf: BloomFilter, key: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    column(BloomMightContain(expression(key), bos.toByteArray))
  }
}
