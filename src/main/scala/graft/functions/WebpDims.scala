package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Native `[width, height, variant]` extraction from WebP bytes
  * (`array<int>`, NULL when the bytes are not a parseable WebP;
  * variant: 0 = lossy VP8, 1 = lossless VP8L, 2 = extended VP8X).
  *
  * WebP is RIFF-framed like WAV, but unlike PNG/GIF/BMP the dimensions
  * are NOT at a fixed offset: they live inside whichever bitstream chunk
  * leads the chunk chain, in three different bit-packed layouts — so
  * like [[JpegDims]] this is a walk behind a native codegen'd
  * expression, not a substring read. Format facts used (all from the
  * public WebP container + VP8/VP8L bitstream specs, RFC 9649 / RFC 6386):
  *   - "RIFF" u32sizeLE "WEBP", then `fourcc(4) size(4 LE) payload`
  *     chunks, each padded to even length;
  *   - "VP8 " (lossy): 3-byte frame tag, sync 9D 01 2A, then
  *     u16LE & 0x3FFF width and height (upper 2 bits are scale hints);
  *   - "VP8L" (lossless): 0x2F signature byte, then a u32LE packing
  *     14-bit width−1 and 14-bit height−1;
  *   - "VP8X" (extended): 4 flag/reserved bytes, then u24LE canvas
  *     width−1 and height−1 (dims of the composed canvas — the honest
  *     answer for animated/alpha files without decoding subframes).
  * The walk skips unknown chunks by their declared size and reports the
  * FIRST bitstream chunk's dimensions (per spec VP8X, when present,
  * leads the chain). Truncation, bad sync bytes, or a zero VP8 dimension
  * yield NULL — crawled bytes are adversarial input, never an error.
  */
case class WebpDims(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_webp_dims"

  override def nullSafeEval(input: Any): Any = {
    val dims = WebpDims.scan(input.asInstanceOf[Array[Byte]])
    if (dims == null) null else UnsafeArrayData.fromPrimitiveArray(dims)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val dims = ctx.freshName("dims")
      s"""
         |int[] $dims = graft.functions.WebpDims.scan($bytes);
         |if ($dims == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($dims);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WebpDims =
    copy(child = newChild)
}

object WebpDims {
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u24le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
  private def u32le(b: Array[Byte], i: Int): Long =
    (u24le(b, i).toLong & 0xffffffL) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private val RIFF = tag("RIFF".getBytes("US-ASCII"), 0)
  private val WEBP = tag("WEBP".getBytes("US-ASCII"), 0)
  private val VP8 = tag("VP8 ".getBytes("US-ASCII"), 0)
  private val VP8L = tag("VP8L".getBytes("US-ASCII"), 0)
  private val VP8X = tag("VP8X".getBytes("US-ASCII"), 0)

  /** The chunk walk; static so generated code calls it directly.
    * Returns `{width, height, variant}` or null.
    */
  def scan(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 20) return null
    if (tag(b, 0) != RIFF || tag(b, 8) != WEBP) return null
    // cursor rides a Long (MkvMeta's discipline): a declared chunk size
    // near 2³¹ must walk off the END of the buffer, not wrap an Int into
    // a negative index — crawled bytes are adversarial input
    var i = 12L
    // bounded by buffer length: every step advances ≥ 8 bytes
    while (i + 8 <= b.length) {
      val id = tag(b, i.toInt)
      val size = u32le(b, i.toInt + 4)
      val p = i.toInt + 8 // payload start
      if (id == VP8) {
        // frame tag(3) sync(3: 9D 01 2A) w(2 LE) h(2 LE)
        if (p + 10 > b.length || size < 10) return null
        if ((b(p + 3) & 0xff) != 0x9d || (b(p + 4) & 0xff) != 0x01 ||
          (b(p + 5) & 0xff) != 0x2a) return null
        val w = u16le(b, p + 6) & 0x3fff
        val h = u16le(b, p + 8) & 0x3fff
        if (w == 0 || h == 0) return null
        return Array(w, h, 0)
      } else if (id == VP8L) {
        // signature 0x2F, then u32LE: 14-bit w−1 | 14-bit h−1 | …
        if (p + 5 > b.length || size < 5) return null
        if ((b(p) & 0xff) != 0x2f) return null
        val bits = u32le(b, p + 1)
        val w = (bits & 0x3fff).toInt + 1
        val h = ((bits >> 14) & 0x3fff).toInt + 1
        return Array(w, h, 1)
      } else if (id == VP8X) {
        // flags(1) reserved(3) canvasW−1(u24 LE) canvasH−1(u24 LE)
        if (p + 10 > b.length || size < 10) return null
        val w = u24le(b, p + 4) + 1
        val h = u24le(b, p + 7) + 1
        return Array(w, h, 2)
      } else {
        // unknown chunk: skip payload + even padding, in Long — a size
        // near u32 max simply exits the loop instead of wrapping
        i = p.toLong + size + (size & 1L)
      }
    }
    null
  }
}
