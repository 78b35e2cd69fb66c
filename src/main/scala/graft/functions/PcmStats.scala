package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass PCM16 feature extraction over a WAV blob's data chunk:
  * reads every 16-bit little-endian SIGNED sample after the 44-byte
  * RIFF/fmt/data header and returns
  * `array(n_samples, peak, dc_sum, energy)` as exact BIGINTs.
  *
  * Bit-compatible with the declarative twin
  * `transform(sequence(0, n-1), i -> signed LE read via substr/hex/conv)`
  * + `array_max(abs)` / two `aggregate` folds — equality is asserted in
  * MultimodalSpec. The twin interprets its lambda per SAMPLE (two
  * 1-byte substr + hex + conv string round-trips each): measured ~106 s
  * for q141 at sf0.1; this kernel is a zero-allocation byte walk inside
  * whole-stage codegen (~1 s). Same per-row-kernel-vs-explode lesson as
  * [[MinHashSigs]]/[[SimHash64]].
  */
case class PcmStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pcm16_stats expects binary, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "pcm16_stats"

  /** Per-row kernel — also the codegen target. */
  def compute(bytes: Array[Byte]): GenericArrayData = {
    var i = 44
    var n = 0L
    var peak = 0L
    var dc = 0L
    var energy = 0L
    while (i + 1 < bytes.length) {
      // low byte unsigned, high byte signed → value in [-32768, 32767]
      val v: Long = ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toLong
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      dc += v
      energy += v * v
      n += 1
      i += 2
    }
    new GenericArrayData(Array(n, peak, dc, energy))
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pcm16stats", this, classOf[PcmStats].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
