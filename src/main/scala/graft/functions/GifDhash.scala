package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native perceptual difference-hash (dHash-64) of a GIF's pixels
  * (`bigint`, NULL when the bytes are not a parseable non-interlaced
  * GIF87a/GIF89a first frame) — the last lib-free-reachable raster
  * format on the image dedup ladder: GIF's LZW is public-spec
  * arithmetic (variable-width codes 3–12 bits packed LSB-first,
  * clear/end-of-information codes, a 4096-entry dictionary), so like
  * the PNG inflate and the BMP walk it needs zero codec libraries. The
  * hash is the same public dHash finished by the shared [[Dhash64]]
  * cell rule, so GIF renderings dedup ACROSS formats against BMP/PNG
  * renderings of the same pixels.
  *
  * Format facts used (public GIF89a specification): 6-byte signature
  * `GIF87a`/`GIF89a`; logical screen descriptor (width/height u16 LE,
  * packed byte whose bit 7 flags a global color table of 2^(N+1)
  * 3-byte RGB entries); a block stream of extensions (0x21 label +
  * size-prefixed sub-blocks to a 0 terminator — skipped, they carry no
  * pixels), image descriptors (0x2C; left/top/width/height u16 LE;
  * packed byte: bit 7 local color table, bit 6 interlace), and the
  * trailer 0x3B. Pixel data is one LZW minimum-code-size byte then
  * size-prefixed sub-blocks of the code stream: codes start at
  * minCodeSize+1 bits, the dictionary starts at clear+2 entries and
  * grows one entry per decoded code, the width bumps when the next
  * entry would overflow the current width (cap 12 bits), `clear`
  * resets, and the first code after a reset must be a literal.
  *
  * Accepted subset, everything else NULL (crawled bytes are adversarial
  * input — refusal is the contract, exactly [[PngDhash]]'s): the FIRST
  * image descriptor only (animation frames beyond it never decode),
  * a color table present (local wins over global per spec), frame dims
  * within 9×8..4096², every decoded index inside the color table, and
  * a code stream that fills the frame exactly — a truncated stream or
  * an out-of-range code refuses. INTERLACED frames decode: GIF
  * interlace is a pure 4-pass row PERMUTATION of full-width rows
  * (rows 0,8,16…, then 4,12…, then 2,6…, then odd), so unlike PNG's
  * Adam7 — a different sub-image geometry per pass, refused there — a
  * row-destination table handles it exactly. Luma is the BT.601
  * integer transform of the palette entry, the same arithmetic as the
  * BMP/PNG legs.
  */
case class GifDhash(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_gif_dhash"

  override def nullSafeEval(input: Any): Any =
    GifDhash.scan(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val h = ctx.freshName("gh")
      s"""
         |java.lang.Long $h = graft.functions.GifDhash.scan($bytes);
         |if ($h == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $h.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GifDhash =
    copy(child = newChild)
}

object GifDhash {
  /** Like the PNG decode, the LZW output MATERIALIZES the index raster,
    * so the dimension cap bounds allocation, not just work.
    */
  private val MaxDim = 1 << 12
  private val MaxCodes = 4096

  /** The pixel walk; static so generated code calls it directly.
    * Returns the boxed dHash-64 or null.
    */
  def scan(b: Array[Byte]): java.lang.Long = {
    val cs = cells(b)
    if (cs == null) null else java.lang.Long.valueOf(Dhash64.ofCells(cs))
  }

  /** The decode's intermediate: the row-major 8×9 box-averaged integer
    * luma grid (72 longs), or null on refusal — [[BmpDhash.cells]]'s
    * contract for the GIF leg (the shared [[GridLumaCells]] feature
    * seam).
    */
  def cells(b: Array[Byte]): Array[Long] = {
    // signature + logical screen descriptor
    if (b == null || b.length < 14) return null
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
      (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    val lsdPacked = b(10) & 0xff
    var gctOff = -1
    var gctSize = 0
    var i = 13
    if ((lsdPacked & 0x80) != 0) {
      gctSize = 2 << (lsdPacked & 7)
      gctOff = i
      i += 3 * gctSize
    }

    // block walk to the FIRST image descriptor; extensions are skipped
    // by their size-prefixed sub-block chains (their payloads carry no
    // pixels), the trailer or an unknown block type refuses
    var imgOff = -1
    while (imgOff < 0) {
      if (i >= b.length) return null
      (b(i) & 0xff) match {
        case 0x2c => imgOff = i
        case 0x21 =>
          i += 2 // introducer + label
          var done = false
          while (!done) {
            if (i >= b.length) return null
            val sz = b(i) & 0xff
            if (sz == 0) { i += 1; done = true } else i += 1 + sz
          }
        case _ => return null // trailer before any image, or garbage
      }
    }
    if (imgOff + 10 > b.length) return null
    val w = u16(imgOff + 5)
    val h = u16(imgOff + 7)
    val idPacked = b(imgOff + 9) & 0xff
    if (w < 9 || h < 8 || w > MaxDim || h > MaxDim) return null
    // interlace: stream row k lands at rowMap(k) — the public 4-pass
    // permutation; non-interlaced is the identity
    val rowMap = new Array[Int](h)
    if ((idPacked & 0x40) != 0) {
      var sr = 0
      val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
      var p = 0
      while (p < 4) {
        var r = passes(p)._1
        while (r < h) { rowMap(sr) = r; sr += 1; r += passes(p)._2 }
        p += 1
      }
      if (sr != h) return null // h < 5 can't complete the passes; unreachable
    } else {
      var r = 0
      while (r < h) { rowMap(r) = r; r += 1 }
    }
    i = imgOff + 10
    // color table: local wins over global; neither present refuses
    var ctOff = gctOff
    var ctSize = gctSize
    if ((idPacked & 0x80) != 0) {
      ctSize = 2 << (idPacked & 7)
      ctOff = i
      i += 3 * ctSize
    }
    if (ctOff < 0 || ctOff + 3 * ctSize > b.length) return null

    // LZW minimum code size + spliced sub-blocks of the code stream
    if (i >= b.length) return null
    val minCode = b(i) & 0xff
    if (minCode < 2 || minCode > 8) return null
    i += 1
    var dataLen = 0
    var spans: List[(Int, Int)] = Nil // reversed (offset, len)
    var blocksDone = false
    while (!blocksDone && i < b.length) {
      val sz = b(i) & 0xff
      if (sz == 0) blocksDone = true
      else {
        // splice what exists even when the declared size runs past the
        // buffer — PngDhash's truncated-final-chunk discipline; the
        // decode below still refuses unless the codes fill the frame
        val avail = math.min(sz, b.length - (i + 1))
        if (avail > 0) { spans = (i + 1, avail) :: spans; dataLen += avail }
        i += 1 + sz
      }
    }
    if (dataLen == 0) return null
    val data = new Array[Byte](dataLen)
    var off = dataLen
    spans.foreach { case (o, len) =>
      off -= len
      System.arraycopy(b, o, data, off, len)
    }

    // LZW decode (public spec): literals are codes < clear; dictionary
    // entries chain (prefix, suffix); the KwKwK case (code == next free
    // entry) replays the previous string plus its first byte
    val npix = w * h
    val pixels = new Array[Byte](npix)
    var np = 0
    var colC = 0
    var streamRow = 0
    var rowBase = rowMap(0) * w
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](MaxCodes)
    val suffix = new Array[Byte](MaxCodes)
    val stack = new Array[Byte](MaxCodes + 1)
    var sp = 0
    var avail = clear + 2
    var codeSize = minCode + 1
    var codeMask = (1 << codeSize) - 1
    var oldCode = -1
    var firstByte = 0
    var acc = 0
    var nbits = 0
    var di = 0
    var ended = false
    while (np < npix && !ended) {
      while (nbits < codeSize && di < dataLen) {
        acc |= (data(di) & 0xff) << nbits
        nbits += 8
        di += 1
      }
      if (nbits < codeSize) return null // truncated code stream
      val code = acc & codeMask
      acc >>>= codeSize
      nbits -= codeSize
      if (code == clear) {
        avail = clear + 2
        codeSize = minCode + 1
        codeMask = (1 << codeSize) - 1
        oldCode = -1
      } else if (code == eoi) {
        ended = true
      } else {
        if (code > avail || (code == avail && oldCode < 0)) return null
        var cur = code
        if (cur == avail) { // KwKwK: previous string + its first byte
          stack(sp) = firstByte.toByte
          sp += 1
          cur = oldCode
        }
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur)
          sp += 1
          cur = prefix(cur)
        }
        if (cur >= ctSize) return null // literal outside the color table
        firstByte = cur
        stack(sp) = cur.toByte
        sp += 1
        if (np + sp > npix) return null // string overruns the frame
        while (sp > 0) {
          sp -= 1
          pixels(rowBase + colC) = stack(sp)
          colC += 1
          np += 1
          if (colC == w) {
            colC = 0
            streamRow += 1
            if (streamRow < h) rowBase = rowMap(streamRow) * w
          }
        }
        if (oldCode >= 0 && avail < MaxCodes) {
          prefix(avail) = oldCode
          suffix(avail) = firstByte.toByte
          avail += 1
          if (avail == (codeMask + 1) && codeSize < 12) {
            codeSize += 1
            codeMask = (1 << codeSize) - 1
          }
        }
        oldCode = code
      }
    }
    if (np < npix) return null // EOI or stream end before the frame filled

    // 9×8 luma cells over the row-major frame (non-interlaced GIF is
    // top-down), palette luma via the BT.601 integer transform — the
    // shared cell rule finishes cells → bits
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
        var rr = r0
        while (rr < r1) {
          var p = rr * w + c0
          var cc = c0
          while (cc < c1) {
            val e = ctOff + 3 * (pixels(p) & 0xff)
            sum += (299L * (b(e) & 0xff) + 587L * (b(e + 1) & 0xff) +
              114L * (b(e + 2) & 0xff)) / 1000L
            p += 1
            cc += 1
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
