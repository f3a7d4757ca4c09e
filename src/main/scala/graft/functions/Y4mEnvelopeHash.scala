package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native perceptual hash of an UNCOMPRESSED video's FRAME SEQUENCE
  * (`bigint`, NULL when the bytes are not a parseable YUV4MPEG2 stream
  * with ≥ 65 complete frames) — the video leg of the near-dup dedup
  * ladder, closing the last modality column: a real SIGNAL-level decode
  * (per-frame luma-plane sums over raw planes), not header metadata.
  * YUV4MPEG2 is the public uncompressed-video interchange format the
  * mjpegtools/ffmpeg world uses: an ASCII parameter header, then
  * `FRAME<params>\n` + raw planes per frame — parseable with zero codec
  * libraries, the same pure-JVM-by-construction argument as
  * [[BmpDhash]]/[[WavEnergyHash]].
  *
  * The hash is [[WavEnergyHash]]'s envelope dHash one modality over:
  * the frame sequence maps to a 65-window LUMA-MEAN envelope (window w
  * spans frames [w·n/65, (w+1)·n/65) — same integer partition bounds),
  * and bit k is set iff window k is strictly brighter than window k+1
  * by EXACT cross-multiplication (Σ(k)·count(k+1) > Σ(k+1)·count(k) —
  * every frame has the same pixel count, so per-frame luma sums compare
  * windows exactly; no floating point anywhere, an oracle re-derives
  * the bits arithmetically).
  *
  * Format facts used (public yuv4mpeg spec): magic `YUV4MPEG2`, then
  * space-separated tagged parameters to the first `\n` — `W`idth,
  * `H`eight (required), `C`olourspace (`mono` = Y plane only; `420*` =
  * Y + 2 quarter chroma planes; `444` = 3 full planes; chroma is
  * SKIPPED, only luma drives the envelope; other/unknown colourspaces
  * refused); each frame is `FRAME`, optional parameters to `\n`, then
  * the raw planes. A truncated final frame is ignored (crawl prefixes
  * end mid-frame routinely); fewer than 65 complete frames refuse —
  * same floor as the audio envelope. Dimension/frame caps bound the
  * per-asset work exactly like the sibling decodes.
  */
case class Y4mEnvelopeHash(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_y4m_ehash"

  override def nullSafeEval(input: Any): Any =
    Y4mEnvelopeHash.scan(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val h = ctx.freshName("vh")
      s"""
         |java.lang.Long $h = graft.functions.Y4mEnvelopeHash.scan($bytes);
         |if ($h == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $h.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Y4mEnvelopeHash = copy(child = newChild)
}

object Y4mEnvelopeHash {
  private val Magic = "YUV4MPEG2".getBytes("US-ASCII")
  private val FrameTag = "FRAME".getBytes("US-ASCII")

  private val MaxDim = 1 << 12
  private val MaxFrames = 1 << 16
  /** Per-asset luma work bound: pixels summed across all frames. */
  private val MaxLumaBytes = 1L << 26

  private def startsWith(b: Array[Byte], off: Int, tag: Array[Byte]): Boolean = {
    if (off + tag.length > b.length) return false
    var i = 0
    while (i < tag.length) {
      if (b(off + i) != tag(i)) return false
      i += 1
    }
    true
  }

  /** The frame walk; static so generated code calls it directly.
    * Returns the boxed envelope dHash-64 or null.
    */
  def scan(b: Array[Byte]): java.lang.Long = {
    val totals = frameTotals(b)
    if (totals == null) return null
    val n = totals.length

    // 65-window envelope, cross-multiplied strict comparisons (the
    // WavEnergyHash rule at the frame granularity)
    val e = new Array[Long](65)
    val cnt = new Array[Long](65)
    var wdw = 0
    while (wdw < 65) {
      val f0 = (wdw.toLong * n / 65).toInt
      val f1 = ((wdw + 1).toLong * n / 65).toInt
      var s = 0L
      var f = f0
      while (f < f1) {
        s += totals(f)
        f += 1
      }
      e(wdw) = s
      cnt(wdw) = (f1 - f0).toLong
      wdw += 1
    }
    var hash = 0L
    var k = 0
    while (k < 64) {
      // frame totals ≤ 255·2²⁴ and window counts ≤ 2¹⁶: the product
      // stays ~2⁴⁸, far inside Long
      if (e(k) * cnt(k + 1) > e(k + 1) * cnt(k)) hash |= (1L << k)
      k += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** The 65-window luma ENVELOPE as a feature vector (round 17,
    * [[MediaEnvelope]]'s video leg): raw window sums of per-frame luma
    * totals (exact longs) over the clip TRIMMED to the largest
    * multiple of 65 frames, or null on refusal — [[WavEnergyHash
    * .envelope]]'s contract one modality over: equal windows make the
    * sums one common positive multiple of the window means, so cosine
    * consumers see exactly the mean-luma envelope in exact integers.
    * When n % 65 == 0 (every constructed corpus: 65-frame clips) the
    * trim is a no-op.
    */
  def envelope(b: Array[Byte]): Array[Long] = {
    val totals = frameTotals(b)
    if (totals == null) return null
    val win = totals.length / 65 // ≥ 1: frameTotals refuses n < 65
    val e = new Array[Long](65)
    var w = 0
    while (w < 65) {
      var sum = 0L
      var f = w * win
      val f1 = f + win
      while (f < f1) {
        sum += totals(f)
        f += 1
      }
      e(w) = sum
      w += 1
    }
    e
  }

  /** Header + frame walk shared by [[scan]] and [[envelope]]: the
    * per-COMPLETE-frame luma-plane sums (exact-length array, ≥ 65
    * entries), or null on refusal — factored so the hash and the
    * feature vector can never disagree about which frames a clip
    * carries.
    */
  private def frameTotals(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < Magic.length + 1) return null
    if (!startsWith(b, 0, Magic)) return null
    // header params to the first \n: W/H required, C selects the layout
    var i = Magic.length
    var w = -1L
    var h = -1L
    var cMono = false
    var c420 = false
    var c444 = false
    var cSeen = false
    while (i < b.length && b(i) != 0x0a) {
      if (b(i) == ' ') i += 1
      else {
        val tagByte = (b(i) & 0xff).toChar
        val v0 = i + 1
        var j = v0
        while (j < b.length && b(j) != ' ' && b(j) != 0x0a) j += 1
        tagByte match {
          case 'W' | 'H' =>
            var n = 0L
            var k = v0
            var ok = j > v0
            while (k < j && ok) {
              val d = b(k) - '0'
              if (d < 0 || d > 9) ok = false else n = n * 10 + d
              if (n > MaxDim) ok = false // early out: cap before overflow
              k += 1
            }
            if (!ok) return null
            if (tagByte == 'W') w = n else h = n
          case 'C' =>
            cSeen = true
            // EXACT 8-bit token whitelist (public spec tags). A prefix
            // match would accept depth/alpha variants (C420p10, C444p10,
            // C444alpha, Cmono16) as 8-bit layouts — the wrong frameSize
            // usually derails the next FRAME-tag check, but raw plane
            // bytes containing "FRAME\n" at the computed offset would
            // hash garbage instead of refusing (review finding r15).
            new String(b, v0, j - v0, "US-ASCII") match {
              case "mono" => cMono = true
              case "420" | "420jpeg" | "420mpeg2" | "420paldv" => c420 = true
              case "444" => c444 = true
              case _ => return null // refuse, don't misdecode
            }
          case _ => () // F/I/A/X parameters don't affect the luma walk
        }
        i = j
      }
    }
    if (i >= b.length) return null // no header terminator
    i += 1 // past \n
    if (w < 1 || h < 1 || w > MaxDim || h > MaxDim) return null
    if (!cSeen) c420 = true // spec default colourspace is 4:2:0
    if (c420 && ((w & 1L) == 1L || (h & 1L) == 1L)) return null
    val ySize = (w * h).toInt
    val frameSize =
      if (cMono) ySize
      else if (c420) ySize + ySize / 2
      else ySize * 3

    // frame walk: sum the luma plane per COMPLETE frame, skip chroma
    var totals = new Array[Long](64)
    var n = 0
    var lumaBudget = MaxLumaBytes
    var done = false
    while (!done && startsWith(b, i, FrameTag)) {
      var j = i + FrameTag.length
      while (j < b.length && b(j) != 0x0a) j += 1 // optional frame params
      if (j >= b.length || j + 1 + frameSize > b.length) done = true
      else {
        lumaBudget -= ySize
        if (lumaBudget < 0 || n >= MaxFrames) return null
        val data = j + 1
        var sum = 0L
        var p = data
        val end = data + ySize
        while (p < end) {
          sum += (b(p) & 0xff).toLong
          p += 1
        }
        if (n == totals.length) totals = java.util.Arrays.copyOf(totals, n * 2)
        totals(n) = sum
        n += 1
        i = data + frameSize
      }
    }
    if (n < 65) return null
    java.util.Arrays.copyOf(totals, n)
  }
}
