package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native perceptual difference-hash (dHash-64) of an UNCOMPRESSED
  * 24-bit BMP's pixels (`bigint`, NULL when the bytes are not a
  * parseable BI_RGB bitmap) — the first PIXEL decode in the multimodal
  * family, pure-JVM by construction: BITMAPINFOHEADER 24 bpp / BI_RGB
  * stores raw BGR triples at a fixed stride (public format, no codec
  * library needed), so the byte-walk discipline that parses the
  * container headers ([[JpegDims]]/[[WebpDims]]/[[MediaMeta]]) extends
  * one level down to the pixel array, and image NEAR-DUP DEDUP gets a
  * real signature instead of the decode stub.
  *
  * The hash is the standard dHash (public: Krawetz 2013, "Kind of Like
  * That"): box-downsample the pixel grid to 9×8 luma cells, then bit
  * k = r·8+c is set iff cell (r,c) is strictly brighter than its right
  * neighbor (r,c+1) — 8 comparisons per row × 8 rows = 64 bits.
  * Integer-exact throughout so an oracle can re-derive it:
  * luma = (299·R + 587·G + 114·B) / 1000 per pixel (floor), cell =
  * floor(Σ luma / npixels), both in long arithmetic.
  *
  * Format facts used (Windows BITMAPFILEHEADER/BITMAPINFOHEADER, public
  * spec): "BM" magic; pixel-array offset u32 LE at 10; DIB header size
  * u32 LE at 14 (≥ 40 accepts INFO/V4/V5 — 12-byte CORE files have a
  * different field layout and yield NULL); width s32 LE at 18; height
  * s32 LE at 22, NEGATIVE meaning top-down row order; planes u16 = 1;
  * bpp u16 at 28 must be 24; compression u32 at 30 must be 0 (BI_RGB);
  * rows padded to 4-byte stride. Images narrower than the 9×8 grid,
  * truncated pixel arrays, other depths/compressions, or any
  * out-of-range header field yield NULL, never an error — crawled bytes
  * are adversarial input.
  */
case class BmpDhash(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bmp_dhash"

  override def nullSafeEval(input: Any): Any =
    BmpDhash.scan(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val h = ctx.freshName("dh")
      s"""
         |java.lang.Long $h = graft.functions.BmpDhash.scan($bytes);
         |if ($h == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $h.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BmpDhash =
    copy(child = newChild)
}

/** ONE definition of "a BMP this library decodes" — the validated
  * 24-bit BI_RGB header walk shared by [[BmpDhash]] and [[BmpResize]]
  * (r18 review: the two walks previously held verbatim copies of this
  * ~18-line validation block, the drift risk [[WavEnergyHash]]'s
  * `locate` was factored to prevent). Callers apply their own minimum
  * dimensions on top.
  */
private[functions] object BmpHeader {
  private[functions] def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private[functions] def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def s32le(b: Array[Byte], i: Int): Int = u32le(b, i).toInt

  /** Largest accepted dimension: bounds stride·height far inside Long
    * and keeps the per-image work bounded (a 2³⁰-wide header on a
    * 100-byte buffer must fail the length check, not overflow).
    */
  private[functions] val MaxDim = 1 << 20

  /** (dataOffset, width, height, topDown, stride) — geometry of the
    * pixel array, validated against the buffer; null on refusal. */
  final class Geometry(val off: Int, val w: Int, val h: Int,
                       val topDown: Boolean, val stride: Int)

  def locate(b: Array[Byte]): Geometry = {
    if (b == null || b.length < 54) return null
    if (b(0) != 'B' || b(1) != 'M') return null
    val offset = u32le(b, 10)
    val dibSize = u32le(b, 14)
    if (dibSize < 40) return null
    val w = s32le(b, 18)
    val hRaw = s32le(b, 22)
    // Int.MinValue negates to itself — reject before abs
    if (hRaw == Int.MinValue) return null
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (u16le(b, 26) != 1) return null          // planes
    if (u16le(b, 28) != 24) return null         // bpp: BI_RGB truecolor only
    if (u32le(b, 30) != 0L) return null         // compression: BI_RGB
    if (w < 1 || h < 1 || w > MaxDim || h > MaxDim) return null
    if (offset < 14 + dibSize || offset > b.length) return null
    val stride = ((w * 3 + 3) / 4) * 4
    if (offset + stride.toLong * h > b.length) return null
    new Geometry(offset.toInt, w, h, topDown, stride)
  }
}

object BmpDhash {

  /** The pixel walk; static so generated code calls it directly.
    * Returns the boxed dHash-64 or null.
    */
  def scan(b: Array[Byte]): java.lang.Long = {
    val cs = cells(b)
    if (cs == null) null else java.lang.Long.valueOf(Dhash64.ofCells(cs))
  }

  /** The decode's intermediate: the row-major 8×9 box-averaged integer
    * luma grid (72 longs), or null on refusal — the SAME array
    * [[Dhash64]] compresses to 64 bits, exposed since round 17 as the
    * real FEATURE vector ([[GridLumaCells]]) so the bytes→features→ANN
    * pipeline runs on the native decode instead of the multimodal stub.
    */
  def cells(b: Array[Byte]): Array[Long] = {
    val g = BmpHeader.locate(b)
    if (g == null) return null
    val w = g.w; val h = g.h
    if (w < 9 || h < 8) return null // every 9×8 cell must be non-empty
    val topDown = g.topDown
    val stride = g.stride
    val off = g.off

    // 9×8 luma cells: cell (gr, gc) box-averages pixel rows
    // [gr·h/8, (gr+1)·h/8) × cols [gc·w/9, (gc+1)·w/9) — integer
    // partition bounds, every cell non-empty because w ≥ 9, h ≥ 8
    val cells = new Array[Long](72)
    var gr = 0
    while (gr < 8) {
      val r0 = (gr.toLong * h / 8).toInt
      val r1 = ((gr + 1).toLong * h / 8).toInt
      var gc = 0
      while (gc < 9) {
        val c0 = (gc.toLong * w / 9).toInt
        val c1 = ((gc + 1).toLong * w / 9).toInt
        var sum = 0L
        var r = r0
        while (r < r1) {
          // logical row r counts from the TOP; bottom-up files store the
          // bottom row first
          val srow = if (topDown) r else h - 1 - r
          var base = off + srow * stride + c0 * 3
          var c = c0
          while (c < c1) {
            val bl = b(base) & 0xff
            val g = b(base + 1) & 0xff
            val rd = b(base + 2) & 0xff
            sum += (299L * rd + 587L * g + 114L * bl) / 1000L
            base += 3
            c += 1
          }
          r += 1
        }
        cells(gr * 9 + gc) = sum / ((r1 - r0).toLong * (c1 - c0))
        gc += 1
      }
      gr += 1
    }

    cells
  }
}
