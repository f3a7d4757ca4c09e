package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native perceptual difference-hash (dHash-64) of a PNG's pixels
  * (`bigint`, NULL when the bytes are not a parseable non-interlaced
  * 8-bit grayscale/truecolor PNG) — the pixel decode for the format
  * image crawls actually contain, pure-JVM by construction: IDAT is a
  * zlib-deflate stream (`java.util.zip.Inflater`, JDK-only) and the five
  * per-row unfilters (None/Sub/Up/Average/Paeth) are public spec
  * arithmetic, so no codec library is needed. The hash is the same
  * public dHash (Krawetz 2013) as [[BmpDhash]]: 9×8 integer luma
  * box-downsample, bit k = r·8+c set iff cell (r,c) is strictly brighter
  * than (r,c+1) — one definition of the cell rule shared through
  * [[Dhash64]], so BMP-decoded and PNG-decoded renderings of the same
  * pixels hash identically and dedup ACROSS the two formats.
  *
  * Format facts used (public PNG spec, ISO/IEC 15948): 8-byte signature;
  * chunks are len(u32 BE) type(4) data crc(4); IHDR is first with
  * width/height u32 BE, bit depth, color type, compression, filter
  * method, interlace; IDAT chunks concatenate into ONE zlib stream;
  * IEND terminates. Scanlines are 1 filter-type byte + w·bpp filtered
  * bytes, filters 0–4 defined over the left/up/up-left neighbor bytes
  * at lag bpp (Paeth picks the predictor with the smallest absolute
  * delta, ties left→up→up-left).
  *
  * Accepted subset, everything else NULL (crawled bytes are adversarial
  * input, refusal is the contract): bit depth 8; color type 0
  * (grayscale, 1 byte/px — luma = the sample exactly) or 2 (truecolor,
  * 3 bytes/px — the BT.601 integer luma [[BmpDhash]] uses); compression
  * 0; filter method 0; interlace 0 (Adam7 reorders rows across passes —
  * refused, not misdecoded). Checksums (chunk CRCs, zlib adler32) are
  * NOT verified: they prove integrity, not meaning, and a crawl's
  * truncated-but-decodable prefix should hash rather than vanish — so
  * the inflater runs RAW past a validated 2-byte zlib header (CM = 8,
  * no preset dictionary). A stream that cannot fill exactly
  * h·(1 + w·bpp) bytes, an unknown filter type, an oversize dimension,
  * or a missing IDAT all yield NULL, never an error.
  */
case class PngDhash(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_png_dhash"

  override def nullSafeEval(input: Any): Any =
    PngDhash.scan(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val h = ctx.freshName("dh")
      s"""
         |java.lang.Long $h = graft.functions.PngDhash.scan($bytes);
         |if ($h == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $h.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PngDhash =
    copy(child = newChild)
}

object PngDhash {
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def tag(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private val IHDR = 0x49484452
  private val IDAT = 0x49444154
  private val IEND = 0x49454e44

  /** Unlike the BMP walk (which reads pixels in place), the PNG decode
    * MATERIALIZES the unfiltered scanlines, so the dimension cap bounds
    * allocation, not just work: 4096² truecolor is a ~50 MB buffer —
    * already far beyond any thumbnailable crawl asset.
    */
  private val MaxDim = 1 << 12

  /** The pixel walk; static so generated code calls it directly.
    * Returns the boxed dHash-64 or null.
    */
  def scan(b: Array[Byte]): java.lang.Long = {
    val cs = cells(b)
    if (cs == null) null else java.lang.Long.valueOf(Dhash64.ofCells(cs))
  }

  /** The decode's intermediate: the row-major 8×9 box-averaged integer
    * luma grid (72 longs), or null on refusal — [[BmpDhash.cells]]'s
    * contract for the PNG leg (the shared [[GridLumaCells]] feature
    * seam).
    */
  def cells(b: Array[Byte]): Array[Long] = {
    // signature + the complete IHDR chunk
    if (b == null || b.length < 8 + 25) return null
    if ((b(0) & 0xff) != 0x89 || b(1) != 'P' || b(2) != 'N' || b(3) != 'G' ||
      b(4) != 0x0d || b(5) != 0x0a || b(6) != 0x1a || b(7) != 0x0a) return null
    if (u32be(b, 8) != 13L || tag(b, 12) != IHDR) return null
    val w = u32be(b, 16)
    val h = u32be(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    if (bitDepth != 8) return null
    val bpp = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case _ => return null // palette/alpha variants refused
    }
    if ((b(26) & 0xff) != 0 || (b(27) & 0xff) != 0) return null
    if ((b(28) & 0xff) != 0) return null // Adam7 interlace refused
    if (w < 9 || h < 8 || w > MaxDim || h > MaxDim) return null
    val wi = w.toInt
    val hi = h.toInt
    val stride = wi * bpp // filtered bytes per scanline, after the type byte
    val rawLen = hi * (1 + stride)

    // chunk walk: splice every IDAT's payload (they concatenate into one
    // zlib stream), stop at IEND; CRCs skipped, never verified
    var zlibLen = 0
    var spans: List[(Int, Int)] = Nil // (offset, len), reversed
    var i = 8 + 25
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = u32be(b, i)
      val t = tag(b, i + 4)
      val dataOff = i + 8
      if (t == IDAT) {
        // splice whatever payload bytes exist even when the declared
        // length runs past the buffer — the common crawl-truncation
        // shape is an intact length field on a file cut mid-chunk, and
        // the doc's truncated-but-decodable-prefix promise covers it
        // (review finding r15: the old walk skipped such a chunk
        // entirely, refusing assets it should hash)
        val avail = math.min(len, (b.length - dataOff).toLong).toInt
        if (avail > 0) { spans = (dataOff, avail) :: spans; zlibLen += avail }
      } else if (t == IEND) done = true
      val next = i.toLong + 12L + len
      i = if (next > b.length) b.length else next.toInt
    }
    if (spans.isEmpty || zlibLen < 3) return null

    val zlib = new Array[Byte](zlibLen)
    var zo = zlibLen
    spans.foreach { case (off, len) => // spans are reversed: fill back-to-front
      zo -= len
      System.arraycopy(b, off, zlib, zo, len)
    }
    // zlib header: CM must be 8 (deflate), FDICT must be clear; inflate
    // RAW from byte 2 so a truncated/zeroed adler32 trailer cannot veto
    if ((zlib(0) & 0x0f) != 8 || (zlib(1) & 0x20) != 0) return null

    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(zlib, 2, zlibLen - 2)
      var got = 0
      var stalled = false
      while (got < rawLen && !stalled) {
        val n = inf.inflate(raw, got, rawLen - got)
        got += n
        if (n == 0 && (inf.finished() || inf.needsInput() || inf.needsDictionary()))
          stalled = true
      }
      if (got < rawLen) return null // truncated or short stream
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()

    // per-row unfilter, in place (public spec: five filters over the
    // left/up/up-left neighbors at lag bpp)
    var r = 0
    while (r < hi) {
      val rowOff = r * (1 + stride) + 1
      val prevOff = rowOff - (1 + stride)
      val ft = raw(rowOff - 1) & 0xff
      if (ft > 4) return null
      if (ft != 0) {
        var x = 0
        while (x < stride) {
          val a = if (x >= bpp) raw(rowOff + x - bpp) & 0xff else 0
          val up = if (r > 0) raw(prevOff + x) & 0xff else 0
          val c = if (r > 0 && x >= bpp) raw(prevOff + x - bpp) & 0xff else 0
          val pred = ft match {
            case 1 => a
            case 2 => up
            case 3 => (a + up) >> 1
            case _ => // Paeth: nearest of a/up/c to a+up-c, ties a→up→c
              val p = a + up - c
              val pa = math.abs(p - a)
              val pb = math.abs(p - up)
              val pc = math.abs(p - c)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
          }
          raw(rowOff + x) = ((raw(rowOff + x) & 0xff) + pred).toByte
          x += 1
        }
      }
      r += 1
    }

    // 9×8 luma cells over the unfiltered rows (top-down in PNG), the
    // shared cell rule: Dhash64 finishes cells → bits
    val cells = new Array[Long](72)
    var gr = 0
    while (gr < 8) {
      val r0 = (gr.toLong * hi / 8).toInt
      val r1 = ((gr + 1).toLong * hi / 8).toInt
      var gc = 0
      while (gc < 9) {
        val c0 = (gc.toLong * wi / 9).toInt
        val c1 = ((gc + 1).toLong * wi / 9).toInt
        var sum = 0L
        var rr = r0
        while (rr < r1) {
          var base = rr * (1 + stride) + 1 + c0 * bpp
          var cc = c0
          if (bpp == 1) {
            while (cc < c1) {
              sum += (raw(base) & 0xff).toLong
              base += 1
              cc += 1
            }
          } else {
            while (cc < c1) {
              val rd = raw(base) & 0xff
              val g = raw(base + 1) & 0xff
              val bl = raw(base + 2) & 0xff
              sum += (299L * rd + 587L * g + 114L * bl) / 1000L
              base += 3
              cc += 1
            }
          }
          rr += 1
        }
        cells(gr * 9 + gc) = sum / ((r1 - r0).toLong * (c1 - c0))
        gc += 1
      }
      gr += 1
    }
    cells
  }
}
