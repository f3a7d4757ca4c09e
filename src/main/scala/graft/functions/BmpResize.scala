package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native pixel RESIZE of an uncompressed 24-bit BMP (`binary` → `binary`,
  * NULL when the input is not a parseable BI_RGB bitmap or is smaller
  * than the target) — the real byte-level transform
  * [[graft.multimodal.Multimodal.resizeMetaPlan]]'s metadata arithmetic
  * stood in for: box-average downsampling per channel (B, G, R summed
  * and floor-divided independently over each target cell's source
  * rectangle — [[BmpDhash]]'s cell partition generalized to any target
  * grid), emitting a fresh bottom-up BI_RGB bitmap with canonical header
  * fields. Deterministic integer arithmetic throughout, so a resize →
  * re-decode pipeline is oracle-checkable end to end.
  *
  * Downsample only (`w ≥ targetW`, `h ≥ targetH`) — the never-upscale
  * contract resizeMetaPlan declares; smaller inputs, other depths,
  * compressed or truncated files yield NULL, never an error.
  */
case class BmpResize(child: Expression, targetW: Int, targetH: Int)
    extends UnaryExpression {
  require(targetW > 0 && targetH > 0,
    s"target dims must be positive, got ${targetW}x$targetH")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bmp_resize"

  override def nullSafeEval(input: Any): Any =
    BmpResize.scan(input.asInstanceOf[Array[Byte]], targetW, targetH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val out = ctx.freshName("resized")
      s"""
         |byte[] $out = graft.functions.BmpResize.scan($bytes, $targetW, $targetH);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BmpResize =
    copy(child = newChild)
}

object BmpResize {
  private def putU16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
  }

  /** The resize; static so generated code calls it directly. Returns the
    * new BMP bytes or null. Output is always bottom-up with the
    * canonical header ([[graft.queries.GroupC]]'s constructed-bytes
    * constants: offset 54, DIB 40, 2835 ppm), so resize output is
    * byte-deterministic.
    */
  def scan(b: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    // shared header walk (BmpHeader — one definition with BmpDhash);
    // downscale-only is this walk's own floor
    val g = BmpHeader.locate(b)
    if (g == null) return null
    val w = g.w; val h = g.h
    if (w < tw || h < th) return null
    val topDown = g.topDown
    val stride = g.stride
    val off = g.off

    val tStride = ((tw * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + tStride * th) // pad bytes stay zero
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length.toLong)
    putU32(out, 10, 54L)
    putU32(out, 14, 40L)
    putU32(out, 18, tw.toLong)
    putU32(out, 22, th.toLong) // positive: bottom-up, whatever the input
    putU16(out, 26, 1); putU16(out, 28, 24)
    putU32(out, 34, (tStride * th).toLong)
    putU32(out, 38, 2835L); putU32(out, 42, 2835L)

    var gr = 0
    while (gr < th) {
      val r0 = (gr.toLong * h / th).toInt
      val r1 = ((gr + 1).toLong * h / th).toInt
      val oBase = 54 + (th - 1 - gr) * tStride // output row, bottom-up
      var gc = 0
      while (gc < tw) {
        val c0 = (gc.toLong * w / tw).toInt
        val c1 = ((gc + 1).toLong * w / tw).toInt
        var sb = 0L; var sg = 0L; var sr = 0L
        var r = r0
        while (r < r1) {
          val srow = if (topDown) r else h - 1 - r
          var base = off + srow * stride + c0 * 3
          var c = c0
          while (c < c1) {
            sb += b(base) & 0xff
            sg += b(base + 1) & 0xff
            sr += b(base + 2) & 0xff
            base += 3
            c += 1
          }
          r += 1
        }
        val n = (r1 - r0).toLong * (c1 - c0)
        val o = oBase + gc * 3
        out(o) = (sb / n).toByte
        out(o + 1) = (sg / n).toByte
        out(o + 2) = (sr / n).toByte
        gc += 1
      }
      gr += 1
    }
    out
  }
}
