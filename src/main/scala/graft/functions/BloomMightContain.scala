package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter — the probe half
  * of an explicit semi-join reduction (q169): build a sketch of the
  * small side's join keys (`DataFrameStatFunctions.bloomFilter`, a
  * distributed treeAggregate), then drop big-side rows that cannot
  * match BEFORE they reach the shuffle. At 100 TB this is the
  * difference between shuffling the full fact table and shuffling only
  * the ~selectivity·(1+fpp) fraction that can join — the same
  * reduction Spark's runtime row-level filtering injects for eligible
  * plans, available here as a first-class operator under the caller's
  * control (filter size, fpp, and build side are explicit).
  *
  * The filter travels as its serialized bytes (an
  * `Array[Byte]` constructor value, not a child expression — the same
  * captured-model pattern as [[NearestCentroidQ]]) and is deserialized
  * once per executor via the transient lazy val; the per-row probe is
  * two xxhash64-derived probes into a bitset, kept inside whole-stage
  * codegen through a reference-object call. False positives are
  * harmless: the exact join downstream removes them, so the composed
  * result is exact and oracle-checkable.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects BIGINT, got $t")
  }

  override def dataType: DataType = BooleanType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  def contains(v: Long): Boolean = filter.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any =
    contains(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("bloomMightContain", this,
        classOf[BloomMightContain].getName)
      s"${ev.value} = $ref.contains($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
