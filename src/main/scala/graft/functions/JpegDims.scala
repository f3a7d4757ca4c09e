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

/** EXIF orientation (1–8) from JPEG bytes, or NULL when absent — the one
  * EXIF field a resize/layout pipeline MUST read before touching pixels
  * (a portrait photo stored rotated renders sideways without it, and the
  * crawl's thumbnailing stage silently corrupts aspect ratios). Same
  * §2.2-ladder step (b) shape as [[JpegDims]]: the marker walk finds the
  * APP1 segment whose payload is `Exif\0\0`, then the TIFF header inside
  * it declares byte order (`II`/`MM` + the 42 check word) and the IFD0
  * offset, and IFD0's 12-byte entries are scanned for tag 0x0112 (SHORT).
  * All offsets are bounds-checked against the APP1 payload — a hostile
  * IFD offset cannot read outside the segment. Values outside 1–8, a
  * missing tag, or no EXIF at all are NULL (absence, not error — most
  * JPEGs have no EXIF).
  */
case class JpegExifOrientation(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_jpeg_exif_orientation"

  override def nullSafeEval(input: Any): Any = {
    val o = JpegExifOrientation.scan(input.asInstanceOf[Array[Byte]])
    if (o == 0) null else o
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val o = ctx.freshName("orient")
      s"""
         |int $o = graft.functions.JpegExifOrientation.scan($bytes);
         |if ($o == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $o;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): JpegExifOrientation = copy(child = newChild)
}

object JpegExifOrientation {
  /** The walk; static so generated code calls it directly. Returns 1–8,
    * or 0 for "no valid orientation" (primitive sentinel keeps the
    * generated code box-free; the expression maps 0 to NULL).
    */
  def scan(b: Array[Byte]): Int = {
    if (b == null || b.length < 4) return 0
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return 0 // SOI
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return 0
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return 0
      val m = b(j) & 0xff
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i = j + 1
      } else if (m == 0xd9 || m == 0xda) {
        return 0 // EOI / scan data: EXIF can only precede these
      } else {
        if (j + 2 >= b.length) return 0
        val len = ((b(j + 1) & 0xff) << 8) | (b(j + 2) & 0xff)
        if (len < 2) return 0
        if (m == 0xe1) {
          // APP1: payload = [j+3, j+1+len); EXIF needs "Exif\0\0" + TIFF
          val p = j + 3
          val end = math.min(j + 1 + len, b.length)
          if (p + 6 <= end && b(p) == 'E' && b(p + 1) == 'x' &&
              b(p + 2) == 'i' && b(p + 3) == 'f' && b(p + 4) == 0 &&
              b(p + 5) == 0) {
            val o = tiffOrientation(b, p + 6, end)
            if (o != 0) return o
            // a present-but-tagless EXIF falls through: keep walking (a
            // second APP1 — XMP first is common — may carry the TIFF)
          }
        }
        i = j + 1 + len
      }
    }
    0
  }

  /** IFD0 scan inside the TIFF block at [t, end). */
  private def tiffOrientation(b: Array[Byte], t: Int, end: Int): Int = {
    if (t + 8 > end) return 0
    val little =
      if (b(t) == 'I' && b(t + 1) == 'I') true
      else if (b(t) == 'M' && b(t + 1) == 'M') false
      else return 0
    def u16(i: Int): Int =
      if (little) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (little) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    if (u16(t + 2) != 42) return 0
    val ifd = u32(t + 4)
    // hostile offsets: everything stays inside the APP1 payload
    if (ifd < 0 || t + ifd + 2 > end) return 0
    val d = (t + ifd).toInt
    val n = u16(d)
    var e = 0
    while (e < n) {
      val at = d + 2 + 12 * e
      if (at + 12 > end) return 0
      if (u16(at) == 0x0112 && u16(at + 2) == 3 && u32(at + 4) == 1L) {
        val v = u16(at + 8) // SHORT value packs at the value field's start
        return if (v >= 1 && v <= 8) v else 0
      }
      e += 1
    }
    0
  }
}
