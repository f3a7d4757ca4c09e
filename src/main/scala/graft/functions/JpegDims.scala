package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Native `[width, height]` extraction from JPEG bytes (`array<int>`,
  * NULL when the bytes are not a parseable JPEG).
  *
  * PNG/GIF/BMP dimensions live at FIXED offsets, so
  * [[graft.multimodal.Multimodal.imageDimsPlan]] parses them with plain
  * substring/hex expressions. JPEG is the one common container that
  * doesn't: dimensions sit in a start-of-frame segment at a VARIABLE
  * offset behind a marker chain (APPn/COM/quant tables…), each segment
  * carrying its own big-endian length — a scan loop, not an offset read.
  * That makes it exactly the §2.2 ladder's step (b): a scalar kernel that
  * composed built-ins can't express, shipped as a codegen'd expression
  * (the generated code calls [[JpegDims.scan]] — one static JVM method,
  * no virtual dispatch, no interpreted fallback).
  *
  * Format facts used (all from the public JPEG/JFIF spec): stream starts
  * FF D8 (SOI); markers are FF xx with optional FF fill bytes;
  * standalone markers (SOI, TEM, RSTn) have no length; every other
  * segment is FF xx LEN_hi LEN_lo payload with LEN covering itself;
  * SOFn markers are C0–CF except C4 (DHT), C8 (JPG extension), CC (DAC),
  * and carry precision(1) height(2) width(2) at payload start.
  */
case class JpegDims(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_jpeg_dims"

  override def nullSafeEval(input: Any): Any = {
    val dims = JpegDims.scan(input.asInstanceOf[Array[Byte]])
    if (dims == null) null else UnsafeArrayData.fromPrimitiveArray(dims)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val dims = ctx.freshName("dims")
      s"""
         |int[] $dims = graft.functions.JpegDims.scan($bytes);
         |if ($dims == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($dims);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}

object JpegDims {
  /** The marker-chain walk; static so generated code calls it directly.
    * Returns `{width, height}` or null (not a JPEG / truncated / corrupt).
    */
  def scan(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null // SOI
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return null // lost marker sync
      // skip fill bytes: any number of FFs may precede the marker id
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return null
      val m = b(j) & 0xff
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        // SOFn: LEN(2) precision(1) height(2) width(2) — the last needed
        // byte is b(j+7), so a buffer of exactly j+8 bytes is complete
        if (j + 8 > b.length) return null
        val h = ((b(j + 4) & 0xff) << 8) | (b(j + 5) & 0xff)
        val w = ((b(j + 6) & 0xff) << 8) | (b(j + 7) & 0xff)
        // SOF may legally carry height=0 with the real height deferred to a
        // DNL marker (ITU T.81 §B.2.2); treat either zero dim as unparseable
        // so such files land in the NULL-dims bucket, not as height 0
        if (w == 0 || h == 0) return null
        return Array(w, h)
      } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i = j + 1 // standalone marker, no length field
      } else if (m == 0xd9) {
        return null // EOI before any SOF
      } else {
        if (j + 2 >= b.length) return null
        val len = ((b(j + 1) & 0xff) << 8) | (b(j + 2) & 0xff)
        if (len < 2) return null
        i = j + 1 + len
      }
    }
    null
  }
}
