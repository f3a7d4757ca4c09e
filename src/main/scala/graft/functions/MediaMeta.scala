package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Audio/video container-header metadata as pure byte arithmetic — the
  * [[JpegDims]] family extended to the two dominant media containers
  * (both walks follow variable-offset chunk/box chains, so like JPEG they
  * are scan loops behind a native codegen'd expression, not fixed-offset
  * substring reads). This is the metadata-backfill pass a multimodal
  * pipeline runs over billions of crawled assets BEFORE any sample
  * decode: sample rate, channel count, and duration come straight from
  * the container header bytes, no codec library involved.
  *
  * Both expressions return `array<bigint>` with NULLABLE elements: a
  * header can be parseable while one field is legitimately unknown
  * (a WAV streamed with a 0xFFFFFFFF data size, an MP4 mvhd with the
  * all-ones "unknown duration" sentinel, a crawl prefix that ends before
  * the data chunk). Whole-result NULL means "not this container /
  * corrupt"; a NULL element means "container recognized, field unknown".
  */
abstract class MediaMetaExpression extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  /** FQN of the static scan entry point the generated code calls. */
  protected def scanMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val ad = ctx.freshName("meta")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $ad =
         |  $scanMethod($bytes);
         |if ($ad == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $ad;
         |}
       """.stripMargin
    })
}

/** `[sample_rate_hz, channels, bits_per_sample, duration_ms]` from WAV
  * (RIFF) bytes; NULL when the bytes are not a parseable RIFF/WAVE
  * stream. Format facts used (public RIFF/WAVE spec): "RIFF" u32size
  * "WAVE" header, then a chain of `id(4) size(4 LE) payload` chunks,
  * each padded to even length; the `fmt ` chunk carries
  * format(2) channels(2) sampleRate(4) byteRate(4) blockAlign(2)
  * bits(2), all little-endian; duration derives from the `data` chunk's
  * DECLARED size over byteRate — so a header-only crawl prefix still
  * yields the full row when both chunks' headers are present, with no
  * need for the audio payload bytes themselves.
  */
case class WavMeta(child: Expression) extends MediaMetaExpression {
  override def prettyName: String = "graft_wav_meta"
  override protected def scanMethod: String = "graft.functions.WavMeta.scan"
  override def nullSafeEval(input: Any): Any =
    WavMeta.scan(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): WavMeta =
    copy(child = newChild)
}

object WavMeta {
  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private val RIFF = 0x52494646
  private val WAVE = 0x57415645
  private val FMT = 0x666d7420 // "fmt "
  private val DATA = 0x64617461
  private val UNKNOWN_SIZE = 0xffffffffL

  /** The chunk walk; static so generated code calls it directly. Returns
    * the 4-element metadata array (nullable elements) or null.
    */
  def scan(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 12) return null
    if (tag(b, 0) != RIFF || tag(b, 8) != WAVE) return null
    var sr: java.lang.Long = null
    var ch: java.lang.Long = null
    var bits: java.lang.Long = null
    var byteRate = 0L
    var dataSize = -1L
    var i = 12
    // stop as soon as both chunks are seen: on a full file this skips the
    // (typically dominant) data payload the moment its header is read
    while (i + 8 <= b.length && (sr == null || dataSize < 0)) {
      val id = tag(b, i)
      val size = leU32(b, i + 4)
      // the FIRST fmt chunk decides (sr == null guard): a second fmt
      // before data cannot overwrite — same contract as WavEnergyHash,
      // which mirrors this walk (review finding r15)
      if (id == FMT && sr == null) {
        if (size < 16 || i + 8 + 16 > b.length) return null
        ch = leU16(b, i + 10).toLong
        sr = leU32(b, i + 12)
        byteRate = leU32(b, i + 16)
        bits = leU16(b, i + 22).toLong
      } else if (id == DATA) {
        dataSize = size
      }
      // declared sizes are trusted for the SKIP too; a size that overflows
      // the buffer just ends the walk with whatever was already found
      // (crawl prefixes end mid-chunk routinely). Chunks pad to even; the
      // arithmetic stays in Long so a ~2³¹ declared size can't wrap an Int
      // and send the cursor negative.
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > b.length) b.length else next.toInt
    }
    if (sr == null) return null // no fmt chunk ⇒ not a usable WAVE
    val dur: java.lang.Long =
      if (dataSize < 0 || dataSize == UNKNOWN_SIZE || byteRate <= 0) null
      else dataSize * 1000L / byteRate
    new GenericArrayData(Array[Any](sr, ch, bits, dur))
  }
}

/** `[duration_ms, timescale]` from MP4 / ISO BMFF bytes (the movie-level
  * values every player shows); NULL when the bytes are not a parseable
  * BMFF stream with a reachable `moov`→`mvhd`. Format facts used (public
  * ISO/IEC 14496-12 spec): the file is a chain of `size(4 BE) type(4)`
  * boxes — size 1 means a 64-bit largesize follows, size 0 means
  * to-end-of-buffer; `mvhd` (inside `moov`) carries version(1) flags(3),
  * then v0: created(4) modified(4) timescale(4) duration(4) /
  * v1: created(8) modified(8) timescale(4) duration(8), all big-endian;
  * duration is in timescale units, all-ones means unknown.
  *
  * Scale note: non-faststart MP4s put `moov` AFTER `mdat`, so a
  * header-only crawl prefix of such a file yields NULL — that is the
  * honest answer (the metadata genuinely is not in the prefix), and why
  * crawl pipelines fetch byte-range tails for MP4s.
  */
case class Mp4Meta(child: Expression) extends MediaMetaExpression {
  override def prettyName: String = "graft_mp4_meta"
  override protected def scanMethod: String = "graft.functions.Mp4Meta.scan"
  override def nullSafeEval(input: Any): Any =
    Mp4Meta.scan(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
    copy(child = newChild)
}

object Mp4Meta {
  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def beU64(b: Array[Byte], i: Int): Long =
    (beU32(b, i) << 32) | beU32(b, i + 4)
  private val MOOV = 0x6d6f6f76L
  private val MVHD = 0x6d766864L

  /** Walks one box level over b[from, to); returns `[start, end)` payload
    * bounds of the first box of `boxType`, or null. Static array return
    * keeps the two-level walk allocation-free until the hit.
    */
  private def findBox(b: Array[Byte], from: Int, to: Int,
      boxType: Long): Array[Int] = {
    var i = from
    while (i + 8 <= to) {
      val size32 = beU32(b, i)
      val t = beU32(b, i + 4)
      var header = 8L
      var size = size32
      if (size32 == 1L) {
        if (i + 16 > to) return null
        size = beU64(b, i + 8); header = 16L
      } else if (size32 == 0L) {
        size = (to - i).toLong // final box: extends to end
      }
      if (size < header) return null // malformed: box smaller than header
      val end = math.min(i + size, to.toLong).toInt
      if (t == boxType) return Array((i + header).toInt, end)
      if (i + size > to) return null // next box would start past the buffer
      i = (i + size).toInt
    }
    null
  }

  /** The two-level box walk; static so generated code calls it directly. */
  def scan(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 8) return null
    val moov = findBox(b, 0, b.length, MOOV)
    if (moov == null) return null
    val mvhd = findBox(b, moov(0), moov(1), MVHD)
    if (mvhd == null) return null
    val p = mvhd(0)
    if (p + 4 > mvhd(1)) return null
    val version = b(p) & 0xff
    var timescale = 0L
    var duration = 0L
    var unknown = false
    if (version == 0) {
      if (p + 20 > mvhd(1)) return null
      timescale = beU32(b, p + 12)
      duration = beU32(b, p + 16)
      unknown = duration == 0xffffffffL
    } else if (version == 1) {
      if (p + 32 > mvhd(1)) return null
      timescale = beU32(b, p + 20)
      duration = beU64(b, p + 24)
      unknown = duration == -1L // all-ones u64
    } else return null
    if (timescale <= 0L) return null
    // beU64 values above Long.MaxValue arrive negative, and duration*1000
    // can overflow for hostile mvhd payloads: both surface as NULL, the
    // same contract as every other unparseable field.
    val dur: java.lang.Long =
      if (unknown || duration < 0L || duration > Long.MaxValue / 1000L) null
      else duration * 1000L / timescale
    new GenericArrayData(Array[Any](dur, java.lang.Long.valueOf(timescale)))
  }
}

/** `[sample_rate_hz, channels, bits_per_sample, duration_ms]` from FLAC
  * bytes — [[WavMeta]]'s exact output shape for the dominant lossless
  * codec, so a pipeline's audio-metadata column unions across both
  * containers without a schema branch. NULL when the bytes are not a
  * parseable FLAC stream. Format facts used (public FLAC spec): "fLaC"
  * magic, then metadata blocks of `flags+type(1) length(3 BE) payload`
  * (bit 7 of the first byte = last-block); STREAMINFO (type 0, 34 bytes —
  * the spec mandates it first, but the walk tolerates reordered blocks on
  * a crawl) packs, after 10 bytes of block/frame sizes: sample rate
  * (20 bits), channels−1 (3), bits−1 (5), total samples (36). Duration
  * derives from total samples over the rate; the spec's "0 = unknown"
  * sentinel for total samples yields a NULL duration, and a 0 sample rate
  * refuses the stream (spec: invalid).
  */
case class FlacMeta(child: Expression) extends MediaMetaExpression {
  override def prettyName: String = "graft_flac_meta"
  override protected def scanMethod: String = "graft.functions.FlacMeta.scan"
  override def nullSafeEval(input: Any): Any =
    FlacMeta.scan(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): FlacMeta =
    copy(child = newChild)
}

object FlacMeta {
  private val MAGIC = 0x664c6143 // "fLaC"
  private def beU32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** The block walk; static so generated code calls it directly. */
  def scan(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 8) return null
    if (beU32(b, 0) != MAGIC) return null
    var i = 4
    var last = false
    while (!last && i + 4 <= b.length) {
      val head = b(i) & 0xff
      last = (head & 0x80) != 0
      val tpe = head & 0x7f
      val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) |
        (b(i + 3) & 0xff)
      if (tpe == 0) {
        val p = i + 4
        if (len < 34 || p + 34 > b.length) return null // truncated STREAMINFO
        val sr = ((b(p + 10) & 0xffL) << 12) | ((b(p + 11) & 0xffL) << 4) |
          ((b(p + 12) & 0xffL) >> 4)
        if (sr == 0L) return null // spec: 0 is invalid (non-audio)
        val ch = ((b(p + 12) >> 1) & 0x7) + 1L
        val bits = (((b(p + 12) & 1L) << 4) | ((b(p + 13) & 0xffL) >> 4)) + 1L
        val total = ((b(p + 13) & 0x0fL) << 32) | ((b(p + 14) & 0xffL) << 24) |
          ((b(p + 15) & 0xffL) << 16) | ((b(p + 16) & 0xffL) << 8) |
          (b(p + 17) & 0xffL)
        val dur: java.lang.Long = if (total == 0L) null else total * 1000L / sr
        return new GenericArrayData(Array[Any](
          java.lang.Long.valueOf(sr), java.lang.Long.valueOf(ch),
          java.lang.Long.valueOf(bits), dur))
      }
      i += 4 + len
    }
    null // no STREAMINFO reachable in the (possibly truncated) prefix
  }
}

/** `[sample_rate_hz, channels, bits_per_sample, duration_ms]` from MP3
  * bytes — the third audio container next to [[WavMeta]]/[[FlacMeta]],
  * same output shape (bits_per_sample is always NULL: MP3 is lossy and
  * has no such field — a NULL element, not a fake 16). Format facts used
  * (public ISO 11172-3 + the de-facto ID3v2/Xing specs): an optional
  * ID3v2 tag (`ID3` + syncsafe u32 size) is skipped; the first valid
  * Layer-III frame header (11-bit sync, version/bitrate/samplerate
  * indices all valid) gives the sample rate and channel mode; duration
  * comes from the Xing/Info VBR tag's frame count (frames × 1152 or 576
  * samples / rate) when present. A CBR file without a Xing tag gets NULL
  * duration — estimating from byte length is wrong on every crawl prefix,
  * so the honest contract is "duration only when the header declares it"
  * (Mp4Meta's non-faststart discipline).
  */
case class Mp3Meta(child: Expression) extends MediaMetaExpression {
  override def prettyName: String = "graft_mp3_meta"
  override protected def scanMethod: String = "graft.functions.Mp3Meta.scan"
  override def nullSafeEval(input: Any): Any =
    Mp3Meta.scan(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Mp3Meta =
    copy(child = newChild)
}

object Mp3Meta {
  // samplerate tables by version bits (00=V2.5, 10=V2, 11=V1), index 0-2
  private val SR = Array(
    Array(11025L, 12000L, 8000L),  // V2.5 (version bits 00)
    null,                          // reserved (01)
    Array(22050L, 24000L, 16000L), // V2 (10)
    Array(44100L, 48000L, 32000L)) // V1 (11)
  // Layer-III bitrate tables (kbps), index 1-14; 0 = free, 15 = bad
  private val BR_V1 = Array(0L, 32L, 40L, 48L, 56L, 64L, 80L, 96L, 112L,
    128L, 160L, 192L, 224L, 256L, 320L)
  private val BR_V2 = Array(0L, 8L, 16L, 24L, 32L, 40L, 48L, 56L, 64L,
    80L, 96L, 112L, 128L, 144L, 160L)

  /** The header walk; static so generated code calls it directly. */
  def scan(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 4) return null
    var i = 0
    // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4), then the tag body.
    // Tags CHAIN (ID3v2.4 §5 allows multiple tags; taggers also leave a
    // stale tag before a rewritten one), and flag bit 4 of byte 5
    // declares a 10-byte footer appended after the body — loop the skip
    // while another 'ID3' header follows and add the footer when flagged,
    // so a large or doubled tag doesn't push the first real frame past
    // the bounded sync scan below
    while (i + 10 <= b.length &&
        b(i) == 'I' && b(i + 1) == 'D' && b(i + 2) == '3') {
      val size = ((b(i + 6) & 0x7fL) << 21) | ((b(i + 7) & 0x7fL) << 14) |
        ((b(i + 8) & 0x7fL) << 7) | (b(i + 9) & 0x7fL)
      val footer = if ((b(i + 5) & 0x10) != 0) 10L else 0L
      val next = i + 10L + size + footer
      if (next >= b.length) return null
      i = next.toInt
    }
    if (i + 4 > b.length) return null
    // scan forward for a valid Layer-III frame header: crawls carry junk
    // between tag and first frame; validity = sync + defined version +
    // layer III + non-reserved bitrate/samplerate indices. The search is
    // BOUNDED (64 KiB past the tag): a non-MP3 asset fed through the
    // combined metadata plan must cost O(window), not O(asset), per row
    val limit = math.min(b.length, i + 65536)
    while (i + 4 <= limit) {
      if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xe0) == 0xe0) {
        val version = (b(i + 1) >> 3) & 0x3
        val layer = (b(i + 1) >> 1) & 0x3
        val brIdx = (b(i + 2) >> 4) & 0xf
        val srIdx = (b(i + 2) >> 2) & 0x3
        val mode = (b(i + 3) >> 6) & 0x3
        if (version != 1 && layer == 1 && brIdx != 0xf && brIdx != 0 &&
            srIdx != 3) {
          val sr = SR(version)(srIdx)
          val ch = if (mode == 3) 1L else 2L
          val v1 = version == 3
          val spf = if (v1) 1152L else 576L
          // a 4-byte pseudo-sync occurs in arbitrary bytes about once per
          // 16 KiB, so one valid-looking header is NOT evidence of an MP3
          // (a 64 KiB window of mdat data would "match" a few times).
          // Demand corroboration: a Xing/Info VBR tag at the exact
          // side-info offset, or a second valid frame header exactly one
          // computed frame length away — junk satisfies neither.
          val crc = if ((b(i + 1) & 1) == 0) 2 else 0 // protection bit 0 ⇒ CRC16
          val side = if (v1) { if (mode == 3) 17 else 32 }
            else { if (mode == 3) 9 else 17 }
          val x = i + 4 + crc + side
          var xing = false
          var dur: java.lang.Long = null
          if (x + 8 <= b.length &&
              ((b(x) == 'X' && b(x + 1) == 'i' && b(x + 2) == 'n' && b(x + 3) == 'g') ||
               (b(x) == 'I' && b(x + 1) == 'n' && b(x + 2) == 'f' && b(x + 3) == 'o'))) {
            xing = true
            val flags = ((b(x + 4) & 0xffL) << 24) | ((b(x + 5) & 0xffL) << 16) |
              ((b(x + 6) & 0xffL) << 8) | (b(x + 7) & 0xffL)
            if ((flags & 1L) != 0 && x + 12 <= b.length) {
              val frames = ((b(x + 8) & 0xffL) << 24) | ((b(x + 9) & 0xffL) << 16) |
                ((b(x + 10) & 0xffL) << 8) | (b(x + 11) & 0xffL)
              if (frames > 0L) dur = frames * spf * 1000L / sr
            }
          }
          var corroborated = xing
          if (!corroborated) {
            val br = (if (v1) BR_V1 else BR_V2)(brIdx)
            val pad = (b(i + 2) >> 1) & 1
            val frameLen = ((if (v1) 144000L else 72000L) * br / sr + pad).toInt
            val nx = i + frameLen
            corroborated = frameLen > 4 && nx + 2 <= b.length &&
              (b(nx) & 0xff) == 0xff && (b(nx + 1) & 0xe0) == 0xe0 &&
              ((b(nx + 1) >> 3) & 0x3) == version &&
              ((b(nx + 1) >> 1) & 0x3) == 1
          }
          if (corroborated)
            return new GenericArrayData(Array[Any](
              java.lang.Long.valueOf(sr), java.lang.Long.valueOf(ch), null, dur))
          // else: fall through and keep scanning — it was a pseudo-sync
        }
      }
      i += 1
    }
    null
  }
}

/** `[sample_rate_hz, channels, bits_per_sample, duration_ms]` from
  * Ogg/Opus bytes — the fourth audio container in the family, same
  * output shape (bits_per_sample always NULL: Opus is lossy). Format
  * facts used (public RFC 3533 Ogg framing + RFC 7845 Opus-in-Ogg): an
  * Ogg page is `OggS` version(0) headerType(1) granule(8 LE) serial(4)
  * seq(4) crc(4) nSegs(1) segTable(nSegs); the FIRST page's first packet
  * must be the ID header `OpusHead` magic(8) version(1, major 0 ⇒
  * accepted per §5.1's compat rule) channels(1) preSkip(2 LE)
  * inputRate(4 LE) gain(2) family(1). The reported rate is the header's
  * informational input_sample_rate (48000 when the muxer wrote the
  * spec's "unknown" 0 — Opus always decodes at 48 kHz). Duration comes
  * from the LAST page's granule position (48 kHz PCM count, §4) minus
  * preSkip when that page is present with the EOS flag — found by a
  * BOUNDED backward scan over the trailing 64 KiB; a crawl prefix that
  * ends before the final page yields NULL duration (Mp4Meta's
  * non-faststart discipline: never estimate).
  */
case class OggOpusMeta(child: Expression) extends MediaMetaExpression {
  override def prettyName: String = "graft_opus_meta"
  override protected def scanMethod: String = "graft.functions.OggOpusMeta.scan"
  override def nullSafeEval(input: Any): Any =
    OggOpusMeta.scan(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): OggOpusMeta =
    copy(child = newChild)
}

object OggOpusMeta {
  private def leU16(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
    v
  }
  private def isOggS(b: Array[Byte], i: Int): Boolean =
    b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' && b(i + 3) == 'S'

  /** The page walk; static so generated code calls it directly. */
  def scan(b: Array[Byte]): ArrayData = {
    // first page: header (27) + ≥1 segment table byte + 19-byte OpusHead
    if (b == null || b.length < 47) return null
    if (!isOggS(b, 0) || b(4) != 0) return null
    val nSegs = b(26) & 0xff
    val p = 27 + nSegs // first packet start
    if (nSegs < 1 || p + 19 > b.length) return null
    if (!(b(p) == 'O' && b(p + 1) == 'p' && b(p + 2) == 'u' &&
        b(p + 3) == 's' && b(p + 4) == 'H' && b(p + 5) == 'e' &&
        b(p + 6) == 'a' && b(p + 7) == 'd')) return null
    if (((b(p + 8) & 0xff) >> 4) != 0) return null // incompatible major version
    val ch = (b(p + 9) & 0xffL)
    if (ch == 0L) return null // spec: channel count must be ≥ 1
    val preSkip = leU16(b, p + 10)
    val inputRate = leU32(b, p + 12)
    val sr = if (inputRate == 0L) 48000L else inputRate
    // duration: last EOS page's granule, searched backward over a bounded
    // trailing window (pages are ≤ ~64 KB by construction, RFC 3533 §6)
    var dur: java.lang.Long = null
    var i = b.length - 27
    val floor = math.max(0, b.length - 65536)
    while (dur == null && i >= floor) {
      if (isOggS(b, i) && b(i + 4) == 0 && (b(i + 5) & 0x04) != 0) {
        val granule = le64(b, i + 6)
        // upper bound guards the ×1000: a near-Long.MAX granule in a
        // corrupt page would wrap negative — refuse rather than emit
        // garbage (the family's contract); the bound (~292 Myr of 48 kHz
        // audio) rejects nothing real
        if (granule != -1L && granule >= 0L &&
            granule - preSkip <= Long.MaxValue / 1000L) {
          val samples = math.max(0L, granule - preSkip)
          dur = java.lang.Long.valueOf(samples * 1000L / 48000L)
        } else i -= 1
      } else i -= 1
    }
    new GenericArrayData(Array[Any](
      java.lang.Long.valueOf(sr), java.lang.Long.valueOf(ch), null, dur))
  }
}

/** `[duration_ms, sample_rate_hz, channels, pixel_width, pixel_height,
  * doctype]` from Matroska/WebM bytes (doctype 1 = matroska, 2 = webm);
  * NULL when the bytes are not an EBML/Matroska-family stream. Format
  * facts used (public RFC 8794 EBML + Matroska spec, the one container
  * family the walk set was missing): every element is `ID(VINT, raw
  * marker kept, 1–4 bytes) Size(VINT, marker stripped, 1–8 bytes,
  * all-value-ones = unknown) payload`; the file is an EBML Header
  * (0x1A45DFA3, DocType 0x4282 "matroska"/"webm") followed by one
  * Segment (0x18538067) whose children include Info (0x1549A966 —
  * TimestampScale 0x2AD7B1 uint ns/tick default 10⁶, Duration 0x4489
  * float ticks) and Tracks (0x1654AE6B — TrackEntry 0xAE with TrackType
  * 0x83, Audio 0xE1 {SamplingFrequency 0xB5 float default 8000, Channels
  * 0x9F uint default 1}, Video 0xE0 {PixelWidth 0xB0, PixelHeight
  * 0xBA}). The walk takes the FIRST audio and FIRST video track, skips
  * everything else by declared size (Clusters are never entered), and a
  * crawl prefix that ends mid-structure yields whatever fields were
  * already read — the family's truncation contract. An unknown-size
  * Segment (live streaming) walks children to the buffer end; an
  * unknown-size non-master element ends the walk.
  */
case class MkvMeta(child: Expression) extends MediaMetaExpression {
  override def prettyName: String = "graft_mkv_meta"
  override protected def scanMethod: String = "graft.functions.MkvMeta.scan"
  override def nullSafeEval(input: Any): Any =
    MkvMeta.scan(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): MkvMeta =
    copy(child = newChild)
}

object MkvMeta {
  private val EBML_HEADER = 0x1A45DFA3L
  private val DOC_TYPE = 0x4282L
  private val SEGMENT = 0x18538067L
  private val INFO = 0x1549A966L
  private val TIMESTAMP_SCALE = 0x2AD7B1L
  private val DURATION = 0x4489L
  private val TRACKS = 0x1654AE6BL
  private val TRACK_ENTRY = 0xAEL
  private val TRACK_TYPE = 0x83L
  private val AUDIO = 0xE1L
  private val VIDEO = 0xE0L
  private val SAMPLING_FREQ = 0xB5L
  private val CHANNELS = 0x9FL
  private val PIXEL_WIDTH = 0xB0L
  private val PIXEL_HEIGHT = 0xBAL
  private val UNKNOWN = -1L

  /** VINT length from the first byte's leading-zero count; 0 = invalid
    * (a 0x00 lead byte would mean > 8 bytes, which EBML forbids).
    */
  private def vlen(b0: Int): Int = {
    var mask = 0x80
    var n = 1
    while (mask != 0) {
      if ((b0 & mask) != 0) return n
      mask >>= 1
      n += 1
    }
    0
  }

  /** Mutable cursor over the element stream: `fail` latches on any read
    * that would cross `limit` — the walk then stops with found fields.
    */
  private final class W(val b: Array[Byte], var i: Int, val limit: Int) {
    var fail: Boolean = false
    /** Element ID with marker bits kept (how Matroska quotes IDs). */
    def readId(): Long = {
      if (i >= limit) { fail = true; return 0L }
      val n = vlen(b(i) & 0xff)
      if (n == 0 || n > 4 || i + n > limit) { fail = true; return 0L }
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
      i += n
      v
    }
    /** Element size with the marker stripped; UNKNOWN for all-ones. */
    def readSize(): Long = {
      if (i >= limit) { fail = true; return 0L }
      val b0 = b(i) & 0xff
      val n = vlen(b0)
      if (n == 0 || i + n > limit) { fail = true; return 0L }
      var v = (b0 & (0xff >> n)).toLong
      var k = 1
      while (k < n) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
      i += n
      // all value bits set = "unknown size"
      if (v == (1L << (7 * n)) - 1L) UNKNOWN else v
    }
    /** Payload end clamped to the cursor's own limit; UNKNOWN size runs
      * to the limit (legal for Segment, tolerated for masters).
      */
    def payloadEnd(size: Long): Int =
      if (size == UNKNOWN) limit
      else {
        val e = i.toLong + size
        if (e > limit) limit else e.toInt
      }
    def skip(size: Long): Unit =
      if (size == UNKNOWN) { i = limit } else { i = payloadEnd(size) }
    def uint(size: Long): java.lang.Long = {
      if (size < 0L || size > 8L || i.toLong + size > limit) return null
      var v = 0L
      var k = 0
      while (k < size) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
      java.lang.Long.valueOf(v)
    }
    def float(size: Long): java.lang.Double = {
      if (i.toLong + size > limit) return null
      if (size == 4L) {
        var v = 0
        var k = 0
        while (k < 4) { v = (v << 8) | (b(i + k) & 0xff); k += 1 }
        java.lang.Double.valueOf(java.lang.Float.intBitsToFloat(v).toDouble)
      } else if (size == 8L) {
        var v = 0L
        var k = 0
        while (k < 8) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
        java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(v))
      } else null
    }
    def string(size: Long): String = {
      if (size < 0L || size > 64L || i.toLong + size > limit) return null
      new String(b, i, size.toInt, "US-ASCII")
    }
  }

  /** The EBML walk; static so generated code calls it directly. */
  def scan(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 5) return null
    if (!(b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
        b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)) return null
    val w = new W(b, 4, b.length)
    val hdrSize = w.readSize()
    if (w.fail) return null
    // EBML header children: DocType decides the family verdict. Absent
    // (truncated prefix) defaults to matroska — the EBML magic alone is
    // already a strong claim; an explicit foreign DocType refuses.
    var doctype = 1L
    val hdrEnd = w.payloadEnd(hdrSize)
    while (!w.fail && w.i < hdrEnd) {
      val id = w.readId()
      val size = w.readSize()
      if (!w.fail) {
        if (id == DOC_TYPE) {
          val raw = w.string(size)
          // RFC 8794 §7: String elements may be zero-padded at the end;
          // 'webm\0\0\0\0' is a VALID DocType (review finding, round 13)
          val s = if (raw == null) null else {
            var e = raw.length
            while (e > 0 && raw.charAt(e - 1) == 0) e -= 1
            raw.substring(0, e)
          }
          if (s == null) {}
          else if (s == "matroska") doctype = 1L
          else if (s == "webm") doctype = 2L
          else return null
        }
        w.skip(size)
      }
    }
    w.fail = false
    w.i = hdrEnd
    // Segment
    if (w.i >= b.length) return truncated(doctype)
    val segId = w.readId()
    if (w.fail || segId != SEGMENT) return truncated(doctype)
    val segSize = w.readSize()
    if (w.fail) return truncated(doctype)
    val segEnd = w.payloadEnd(segSize)
    var tscale = 1000000L             // ns per tick, spec default
    var durTicks: java.lang.Double = null
    var sr: java.lang.Long = null
    var ch: java.lang.Long = null
    var pw: java.lang.Long = null
    var ph: java.lang.Long = null
    var sawAudio = false
    var sawVideo = false
    while (!w.fail && w.i < segEnd) {
      val id = w.readId()
      val size = w.readSize()
      if (!w.fail) {
        if (id == INFO) {
          val end = w.payloadEnd(size)
          while (!w.fail && w.i < end) {
            val cid = w.readId()
            val csz = w.readSize()
            if (!w.fail) {
              if (cid == TIMESTAMP_SCALE) {
                val v = w.uint(csz)
                if (v != null && v.longValue > 0L) tscale = v.longValue
              } else if (cid == DURATION) {
                val v = w.float(csz)
                if (v != null) durTicks = v
              }
              w.skip(csz)
            }
          }
          w.fail = false; w.i = end
        } else if (id == TRACKS) {
          val end = w.payloadEnd(size)
          while (!w.fail && w.i < end) {
            val cid = w.readId()
            val csz = w.readSize()
            if (!w.fail) {
              if (cid == TRACK_ENTRY) {
                val tend = w.payloadEnd(csz)
                var ttype = -1L
                var tSr: java.lang.Long = null
                var tSrPresent = false
                var tCh: java.lang.Long = null
                var tPw: java.lang.Long = null
                var tPh: java.lang.Long = null
                var hasAudioEl = false
                var hasVideoEl = false
                while (!w.fail && w.i < tend) {
                  val eid = w.readId()
                  val esz = w.readSize()
                  if (!w.fail) {
                    if (eid == TRACK_TYPE) {
                      val v = w.uint(esz)
                      if (v != null) ttype = v.longValue
                      w.skip(esz)
                    } else if (eid == AUDIO) {
                      hasAudioEl = true
                      val aend = w.payloadEnd(esz)
                      while (!w.fail && w.i < aend) {
                        val aid = w.readId()
                        val asz = w.readSize()
                        if (!w.fail) {
                          if (aid == SAMPLING_FREQ) {
                            tSrPresent = true
                            val v = w.float(asz)
                            // floor of a positive finite rate; refuses
                            // NaN/∞/non-positive rather than emit garbage
                            if (v != null && v.doubleValue > 0.0 &&
                                v.doubleValue <= 9.007199254740992e15)
                              tSr = java.lang.Long.valueOf(
                                math.floor(v.doubleValue).toLong)
                          } else if (aid == CHANNELS) {
                            val v = w.uint(asz)
                            if (v != null) tCh = v
                          }
                          w.skip(asz)
                        }
                      }
                      w.fail = false; w.i = aend
                    } else if (eid == VIDEO) {
                      hasVideoEl = true
                      val vend = w.payloadEnd(esz)
                      while (!w.fail && w.i < vend) {
                        val vid = w.readId()
                        val vsz = w.readSize()
                        if (!w.fail) {
                          if (vid == PIXEL_WIDTH) {
                            val v = w.uint(vsz)
                            if (v != null) tPw = v
                          } else if (vid == PIXEL_HEIGHT) {
                            val v = w.uint(vsz)
                            if (v != null) tPh = v
                          }
                          w.skip(vsz)
                        }
                      }
                      w.fail = false; w.i = vend
                    } else {
                      w.skip(esz)
                    }
                  }
                }
                w.fail = false; w.i = tend
                // first track of each kind wins; spec defaults apply only
                // when the kind's element exists at all
                if (ttype == 2L && hasAudioEl && !sawAudio) {
                  sawAudio = true
                  // the spec default covers ABSENT SamplingFrequency only;
                  // present-but-unparseable (non-finite, bad width) stays
                  // unknown rather than silently becoming 8 kHz
                  sr = if (tSr != null) tSr
                       else if (tSrPresent) null
                       else java.lang.Long.valueOf(8000L)
                  ch = if (tCh != null) tCh else java.lang.Long.valueOf(1L)
                }
                if (ttype == 1L && hasVideoEl && !sawVideo) {
                  sawVideo = true
                  pw = tPw
                  ph = tPh
                }
              } else {
                w.skip(csz)
              }
            }
          }
          w.fail = false; w.i = end
        } else if (size == UNKNOWN) {
          // unknown-size non-master (e.g. a live Cluster): cannot skip
          w.i = segEnd
        } else {
          w.skip(size)
        }
      }
    }
    // duration: ticks × (ns/tick) → ms, floored; refuse non-finite or
    // out-of-range products rather than wrap
    var durMs: java.lang.Long = null
    if (durTicks != null) {
      val ms = durTicks.doubleValue * tscale.toDouble / 1e6
      if (!ms.isNaN && !ms.isInfinite && ms >= 0.0 && ms <= 9.0e15)
        durMs = java.lang.Long.valueOf(math.floor(ms).toLong)
    }
    new GenericArrayData(Array[Any](durMs, sr, ch, pw, ph,
      java.lang.Long.valueOf(doctype)))
  }

  private def truncated(doctype: Long): ArrayData =
    new GenericArrayData(Array[Any](null, null, null, null, null,
      java.lang.Long.valueOf(doctype)))
}
