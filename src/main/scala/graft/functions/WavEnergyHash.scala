package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native energy-envelope hash of a PCM WAV's SAMPLES (`bigint`, NULL
  * when the bytes are not mono 16-bit PCM with a reachable data chunk) —
  * the audio twin of [[BmpDhash]]: WAV stores raw samples at a fixed
  * layout (public RIFF/WAVE spec), so the dedup ladder's last modality
  * gets a real SIGNAL-level fingerprint with no codec library: partition
  * the sample stream into 65 equal windows, per-window energy
  * eₖ = Σ |sample| (exact integer), and bit k (0–63) is set iff window k
  * is strictly louder than window k+1 — the standard perceptual
  * difference-hash idea applied to the energy envelope (Krawetz's dHash
  * over time instead of space; robust to gain-preserving edits that
  * leave the envelope's SHAPE intact, which is what near-dup audio
  * shares). Unequal window sizes (when n % 65 ≠ 0) compare by exact
  * cross-multiplication eₖ·n_{k+1} > e_{k+1}·nₖ — a per-window mean in
  * doubles would make boundary bits an ulp lottery.
  *
  * Format facts used: "RIFF" u32sizeLE "WAVE", then `id(4) size(4 LE)
  * payload` chunks padded to even length; `fmt ` carries
  * audioFormat(u16)=1 (PCM), channels(u16), bits(u16 at +14); `data`
  * carries the raw little-endian samples. Mono 16-bit only — the
  * exactness contract needs one well-defined lane; other shapes, a
  * missing/short data chunk (< 65 samples), or any truncation yield
  * NULL, never an error.
  */
case class WavEnergyHash(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_wav_ehash"

  override def nullSafeEval(input: Any): Any =
    WavEnergyHash.scan(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val h = ctx.freshName("eh")
      s"""
         |java.lang.Long $h = graft.functions.WavEnergyHash.scan($bytes);
         |if ($h == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $h.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WavEnergyHash = copy(child = newChild)
}

object WavEnergyHash {
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private val RIFF = tag("RIFF".getBytes("US-ASCII"), 0)
  private val WAVE = tag("WAVE".getBytes("US-ASCII"), 0)
  private val FMT = tag("fmt ".getBytes("US-ASCII"), 0)
  private val DATA = tag("data".getBytes("US-ASCII"), 0)

  /** Work bound: ~2²² samples ≈ 8 MiB of PCM per asset; a header
    * declaring more walks off honestly as NULL rather than grinding.
    */
  private val MaxSamples = 1 << 22

  /** Header walk shared by [[scan]] and [[envelope]]: `(dataOff,
    * nSamples)` of the governing mono-16-bit PCM data window, or null on
    * refusal — factored so the hash and the feature vector can never
    * disagree about WHICH samples a WAV carries.
    */
  private def locate(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 44) return null
    if (tag(b, 0) != RIFF || tag(b, 8) != WAVE) return null
    var i = 12L
    var fmtSeen = false
    var fmtOk = false
    var dataOff = -1
    var dataLen = -1L
    // WavMeta's loop contract exactly (review findings r14/r15): the
    // FIRST fmt chunk decides — the branch guard makes that literal, so
    // a second fmt arriving BEFORE data cannot overwrite the verdict
    // (a malformed first fmt still refuses, like WavMeta) — and the walk
    // STOPS once fmt and data are both seen, so a trailing stale chunk
    // can never retroactively veto a parse WavMeta accepts. The two
    // walks agree on which fmt governs the same bytes.
    while ((!fmtSeen || dataOff < 0) && i + 8 <= b.length) {
      val id = tag(b, i.toInt)
      val size = u32le(b, i.toInt + 4)
      val p = i.toInt + 8
      if (id == FMT && !fmtSeen) {
        if (size < 16 || p + 16 > b.length) return null
        fmtSeen = true
        fmtOk = u16le(b, p) == 1 && u16le(b, p + 2) == 1 &&
          u16le(b, p + 14) == 16
      } else if (id == DATA && dataOff < 0) {
        dataOff = p
        dataLen = math.min(size, b.length.toLong - p)
      }
      i += 8L + size + (size & 1L) // RIFF pads chunks to even length
    }
    if (!fmtOk || dataOff < 0) return null
    val n = (dataLen / 2).toInt
    if (n < 65 || n > MaxSamples) return null
    Array(dataOff, n)
  }

  /** The sample walk; static so generated code calls it directly. */
  def scan(b: Array[Byte]): java.lang.Long = {
    val loc = locate(b)
    if (loc == null) return null
    val dataOff = loc(0)
    val n = loc(1)

    val e = new Array[Long](65)
    val cnt = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val s0 = (w.toLong * n / 65).toInt
      val s1 = ((w + 1).toLong * n / 65).toInt
      var sum = 0L
      var s = s0
      while (s < s1) {
        val o = dataOff + s * 2
        val v = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
        sum += math.abs(v)
        s += 1
      }
      e(w) = sum
      cnt(w) = (s1 - s0).toLong
      w += 1
    }

    var hash = 0L
    var k = 0
    while (k < 64) {
      // exact mean comparison by cross-multiplication; bounded by
      // 32768·MaxSamples² « 2⁶³
      if (e(k) * cnt(k + 1) > e(k + 1) * cnt(k)) hash |= (1L << k)
      k += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** The 65-window energy ENVELOPE as a feature vector (round 17,
    * [[MediaEnvelope]]'s audio leg): raw window sums Σ|sample| (exact
    * longs) over the stream TRIMMED to the largest multiple of 65
    * samples, or null on refusal. Equal windows by construction, so
    * the raw sums are one common positive multiple of the window MEANS
    * — scale-invariant consumers (cosine similarity, the downstream
    * ANN family) see exactly the mean-energy envelope while every
    * value stays an exact integer an oracle can re-derive. When
    * n % 65 == 0 (every constructed corpus) the trim is a no-op and
    * the envelope is bit-for-bit the one [[scan]] hashes.
    */
  def envelope(b: Array[Byte]): Array[Long] = {
    val loc = locate(b)
    if (loc == null) return null
    val dataOff = loc(0)
    val win = loc(1) / 65 // ≥ 1: locate refuses n < 65
    val e = new Array[Long](65)
    var w = 0
    while (w < 65) {
      var sum = 0L
      var s = w * win
      val s1 = s + win
      while (s < s1) {
        val o = dataOff + s * 2
        val v = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
        sum += math.abs(v)
        s += 1
      }
      e(w) = sum
      w += 1
    }
    e
  }
}
