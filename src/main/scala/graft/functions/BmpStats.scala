package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** One-pass 24bpp BMP pixel decode → `[n_pixels, sum_b, sum_g, sum_r]`
  * — REAL image decoding of actual pixel bytes (BMP is uncompressed,
  * so no codec is needed), not header metadata: the
  * decode→feature-extract stage of a multimodal ingest pipeline (q173),
  * the image analogue of [[PcmStats]]'s audio sample walk.
  *
  * The walk honors the real format: pixel-array offset, width, height
  * and bpp are read from the little-endian header (offset 10/18/22/28),
  * rows are traversed at the 4-byte-aligned stride with the pad bytes
  * SKIPPED — the q173 blobs pad with 0xFF precisely so a walk that
  * reads padding corrupts the sums loudly. Channel order in the bytes
  * is B,G,R per the format. Returns null for non-BMP/unsupported-depth
  * input (magic or bpp mismatch) rather than garbage. Per-row work is
  * a tight byte loop kept inside whole-stage codegen via the
  * reference-object call ([[PcmStats]] pattern); nothing leaves the
  * projection, so the operator scales as a pure map. */
case class BmpStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bmp_stats expects BINARY, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "bmp_stats"

  private def le(b: Array[Byte], pos: Int, n: Int): Long = {
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xffL); i -= 1 }
    v
  }

  def compute(b: Array[Byte]): GenericArrayData = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val off = le(b, 10, 4).toInt
    val w = le(b, 18, 4).toInt
    val h = le(b, 22, 4).toInt
    val bpp = le(b, 28, 2).toInt
    if (bpp != 24 || w <= 0 || h <= 0) return null
    val stride = (w * 3 + 3) & ~3
    if (off + stride.toLong * h > b.length) return null
    var sb = 0L; var sg = 0L; var sr = 0L
    var y = 0
    while (y < h) {
      var p = off + y * stride
      var x = 0
      while (x < w) {
        sb += b(p) & 0xffL
        sg += b(p + 1) & 0xffL
        sr += b(p + 2) & 0xffL
        p += 3
        x += 1
      }
      y += 1
    }
    new GenericArrayData(Array(w.toLong * h, sb, sg, sr))
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("bmpStats", this,
        classOf[BmpStats].getName)
      s"""${ev.value} = $ref.compute($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
