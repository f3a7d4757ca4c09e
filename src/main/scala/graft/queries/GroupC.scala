package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group C — LLM-data-pipeline operators (SURVEY.md §2.3 Group C; the
  * BASELINE north-star surface): deduplication, near-dup detection,
  * similarity search, text analysis, and semi-structured column handling —
  * all declarative DataFrame plans (zero UDFs, zero collect()), each with a
  * DuckDB oracle.
  *
  * Shared text normalization (used by c2/c4 and Group D): lowercase, crush
  * every non-alphanumeric run to a single space, trim, split on the single
  * space. Both engines evaluate the identical regex so token streams match
  * exactly.
  */
object GroupC {
  type Q = (SparkSession, String) => DataFrame

  /** `split(trim(lower(regexp_replace(text, ...))), ' ')` as a reusable
    * fragment; DuckDB twin is [[tokenizeSql]].
    */
  def tokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split(trim(lower(regexp_replace(c, "[^a-zA-Z0-9]+", " "))), " ")

  /** DuckDB-side tokenizer over a column expression, kept textually in one
    * place so every oracle uses the identical normalization.
    */
  def tokenizeSql(col: String): String =
    s"string_split(trim(lower(regexp_replace($col, '[^a-zA-Z0-9]+', ' ', 'g'))), ' ')"

  /** Distinct word-3-gram shingles per document, pre-hashed to 64-bit
    * longs (xxhash64): the unit of near-dup comparison for c2 and the
    * MinHash input for d1. Hashing before the joins keeps every
    * downstream shuffle and join key at 8 bytes instead of a multi-word
    * string — the thing that matters when the corpus is 100 TB. (Set
    * semantics are preserved modulo 64-bit hash collisions: ~n²/2⁶⁵,
    * negligible at any realistic shingle cardinality.) Documents shorter
    * than 3 tokens have no shingles and drop out — same rule both sides.
    *
    * Since round 9 the per-doc set comes from the native codegen'd
    * [[graft.functions.ShingleHashes]] kernel (set-identical to the old
    * tokenize→transform→explode→distinct pipeline, pinned in
    * ShingleHashesSpec) — which DELETES the per-(doc,shingle) distinct
    * aggregation and its full-corpus exchange: the kernel emits each
    * doc's distinct set directly, so `explode` yields the final frame
    * with zero shuffles. Measured across the family at sf0.1 (min-of-3,
    * with the pairOverlap merge pin below): c2 2.38→1.24, c7 2.55→0.98,
    * d30 3.82→1.92, d34 3.66→2.32, d43 2.75→1.71, d1 2.23→1.71 s. Two
    * plan consequences, both handled at the JOIN sites: the frame no
    * longer carries an exchange for AQE to size (see pairOverlap's merge
    * pin), and the old constraint-propagation inline trap is moot (the
    * kernel is one cheap char scan wherever Catalyst copies it).
    */
  def shingles(spark: SparkSession, sfDir: String): DataFrame =
    // r22: a Tables.fanned repartition was A/B'd here and REVERTED —
    // the kernel is cheap enough that the extra exchange + 32-task
    // scheduling cost more than the serial explode saves (BenchOne
    // min-of-5 at c32: d30 2.40 bare vs 5.21 fanned; the win sites are
    // the heavy regex chains, see d100/csvRoundTrip)
    shinglesOf(Tables(spark, sfDir, "documents"))

  /** [[shingles]] over an explicit (possibly pre-filtered) documents
    * relation — filtering docs BEFORE tokenizing commutes with the per-doc
    * shingle computation, and when a caller needs only a subset (d23's
    * benchmark side) it avoids tokenizing the whole corpus just to join
    * most of it away.
    */
  def shinglesOf(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), explode(org.apache.spark.sql.functions
        .call_function(graft.functions.GraftFunctions.ShingleHashesName,
          col("text"))).as("shingle"))
  }

  /** c1: exact deduplication — keep the smallest doc_id per identical text
    * (deterministic tiebreak, unlike dropDuplicates whose survivor is
    * partition-order dependent). One shuffle on the dedup key. At 100 TB
    * the key would be a 128-bit text fingerprint (see d8) rather than the
    * full text, so shuffle rows stay small.
    */
  def c1DedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
    val w = Window.partitionBy("text").orderBy("doc_id")
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** c2: near-duplicate pairs by exact shingle Jaccard ≥ 0.6. The join is
    * BUCKETED BY SHINGLE (inverted index) — only documents sharing a
    * shingle ever meet, never all-pairs. This exact variant is the declared
    * oracle-checked query; d1 is the MinHash+LSH formulation whose
    * candidate generation stays cheap when hot shingles would make this
    * join skew at 100 TB.
    */
  /** Inverted-index candidate pairs with overlap and set sizes —
    * (doc_a, doc_b, c, na, nb), the shared skeleton c2 (symmetric Jaccard)
    * and c7 (asymmetric containment) both derive their verdicts from, so a
    * future change to the join (skew handling, the MinHash-banding scale
    * path) lands in both.
    *
    * The shingle subplan feeds both self-join sides and the two size
    * lookups (4 evaluations — exchanges differ, so ReuseExchange can't
    * fire), so it sits behind a lazy localCheckpoint barrier (r21): the
    * kernel pass pays once per call and all four consumers read the
    * materialized (doc_id, shingle) rows. Measured at sf0.1 (min-of-4+):
    * c2 1.25→1.03, c7 1.01→0.76, d47 1.37→1.31 s — reversing the
    * pre-kernel-era "deliberately not persisted" call, whose cache-churn
    * cost was measured against the CacheManager persist path, not the
    * checkpoint leaf. (r13 history kept below for the join-pin context.)
    *
    * The self-join is PINNED merge: both sides are the same bare exploded
    * frame, which since the kernel lineage has no exchange beneath it —
    * the static planner would size it from pre-explode scan stats and
    * commit a broadcast AQE can never revisit. Broadcasting a full
    * exploded corpus side is wrong at every scale — and measured slower
    * locally too (c2 2.00 s estimate-broadcast vs 1.00 s pinned at sf0.1;
    * the per-task hash table over the whole inverted index costs more
    * than the shuffle it avoids). The probe/verify joins in the
    * d30-family deliberately do NOT carry this pin — their small sides
    * sit above real exchanges, so estimate-driven broadcast is right
    * locally and degrades to SMJ at scale (see d30ContainmentProbe).
    */
  def pairOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    // r22 note: d57's keyed-repartition-instead-of-checkpoint shape was
    // A/B'd here against this barrier on a quiet box and LOST (c2
    // 1.44/1.47 keyed vs 1.24/1.27 barrier; d47 likewise) — the
    // materialized frame serves the four consumers cheaper than the
    // reused shuffle does at this frame size. Kept as r21 shipped it.
    val sh = shingles(spark, sfDir).localCheckpoint(false)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("a").hint("merge")
      .join(sh.as("b").hint("merge"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("c"),
        col("sa.n").as("na"), col("sb.n").as("nb"))
  }

  def c2DedupNear(spark: SparkSession, sfDir: String): DataFrame =
    pairOverlap(spark, sfDir)
      .select(col("doc_a"), col("doc_b"),
        (col("c").cast("double") /
          (col("na") + col("nb") - col("c")).cast("double")).as("jac"))
      .filter(col("jac") >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Cosine similarity via the native codegen'd expression
    * ([[graft.functions.CosineSimilarity]]): one fused loop per row,
    * bit-equal with both the higher-order-fold formulation and DuckDB's
    * `list_cosine_similarity` (incl. its [-1, 1] clamp). Callers must have
    * registered [[graft.functions.GraftFunctions]] on the session.
    */
  def cosine(a: String, b: String): org.apache.spark.sql.Column =
    expr(s"${graft.functions.GraftFunctions.CosineName}($a, $b)")

  /** Column-expression overload (for computed operands, e.g. d60's
    * decoded-codes reconstruction).
    */
  def cosine(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function(
      graft.functions.GraftFunctions.CosineName, a, b)

  /** c3: brute-force cosine top-k against a fixed query vector (vec_id 0).
    * The one-row query side is broadcast; the scan side streams through a
    * codegen'd higher-order-function pipeline and TakeOrderedAndProject
    * keeps only k rows per partition — no global sort, no driver loop.
    * This is the exact baseline; d4 is the LSH-bucketed approximate path.
    */
  def c3SimilarityTopk(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qv"))
    emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosine("v", "qv"), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(20)
  }

  /** c4: text analysis — corpus term frequency + document frequency over
    * the shared tokenizer. explode + two-level aggregate; partial
    * aggregation keeps the shuffle at one row per (token) per partition.
    */
  def c4TextAnalysis(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** c5: semi-structured (multimodal metadata) column handling — JSON
    * `events.props` parsed with from_json into typed fields. from_json is
    * codegen'd and runs scan-side; only the extracted longs reach the sort.
    */
  def c5MultimodalCols(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    events.select(col("event_id"), col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k_val"))
      .withColumn("k_bucket", col("k_val") % 10)
      .orderBy("event_id")
  }

  /** c8: container-header metadata extraction as an ORACLE-CHECKED query —
    * the multimodal byte-walk family ([[graft.multimodal.Multimodal
    * .imageDimsPlan]]/[[graft.multimodal.Multimodal.mediaMetaPlan]], native
    * codegen'd expressions over PNG/WAV/… public specs) driven end to end
    * under the driver's hash gate. The trick that makes a binary parser
    * DuckDB-verifiable: the content bytes are CONSTRUCTED deterministically
    * from doc_id by Spark expressions (unhex/concat of spec-layout fields —
    * a header-only WAV for doc_id ≡ 0 (mod 11), a PNG signature+IHDR for
    * ≡ 1, an Ogg BOS page carrying OpusHead plus an EOS granule page for
    * ≡ 2, an MP4 moov/mvhd box pair for ≡ 3, a webm EBML tree for ≡ 4,
    * a WebP for ≡ 5 (VP8X canvas on even ids, VP8L packed bits on odd —
    * round 13), and — round 14, closing the "every shipped walk under
    * the hash gate" gap — a FLAC STREAMINFO with its bit-sliced
    * rate/channels/bits/total-samples packing for ≡ 6, a Xing-tagged V1
    * Layer-III MP3 frame for ≡ 7, a JPEG whose APP1/Exif orientation AND
    * SOF0 dims both ride the marker chain for ≡ 8, a BITMAPINFOHEADER
    * BMP (negative top-down height on odd ids) for ≡ 9, magicless junk
    * for ≡ 10; the modulus is PRIME so every `id % m` parameter still
    * varies inside each arm's residue class),
    * then parsed BACK by the native walks; the oracle never sees bytes —
    * it derives the same fields arithmetically from doc_id. A walk that
    * misreads any offset, width, endianness, or the junk-refusal contract
    * hash-mismatches. Round 12 extended the cycle to opus (LE fields, the
    * granule−preSkip duration rule at 48 kHz) and mp4 (BE box walk,
    * mvhd timescale division); with round 14 every shipped audio/image
    * walk is oracle-anchored, not just spec-pinned.
    *
    * Scale shape: pure per-row codegen'd construction + parsing, zero
    * shuffles before the final sort — the metadata-backfill pass is
    * scan-bound at any corpus size (the real pipeline reads `content`
    * from parquet instead of synthesizing it; the plan from the parse on
    * is identical).
    */
  def c8MediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents").select("doc_id")
    def le16(v: Column) = {
      val h = lpad(hex(v), 4, "0")
      unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
    }
    def le32(v: Column) = {
      val h = lpad(hex(v), 8, "0")
      unhex(concat(substring(h, 7, 2), substring(h, 5, 2),
        substring(h, 3, 2), substring(h, 1, 2)))
    }
    def be32(v: Column) = unhex(lpad(hex(v), 8, "0"))
    def u8(v: Column) = unhex(lpad(hex(v), 2, "0"))
    def asc(s: String) = lit(s).cast("binary")
    val id = col("doc_id")
    // WAV params, all derived from doc_id (the oracle re-derives them)
    val sr = lit(8000L) * (lit(1L) + id % 4)
    val chn = lit(1L) + id % 2
    // NOT mod 7: the format cycle is mod 7 (round 13), so a mod-7
    // parameter would be constant across every wav doc
    val secs = lit(1L) + id % 5
    val byteRate = sr * chn * 2 // 16-bit PCM
    val dataSize = byteRate * secs
    val wav = concat(asc("RIFF"), le32(lit(36L) + dataSize), asc("WAVE"),
      asc("fmt "), le32(lit(16L)), le16(lit(1L)), le16(chn), le32(sr),
      le32(byteRate), le16(chn * 2), le16(lit(16L)),
      asc("data"), le32(dataSize)) // header-only: the crawl-prefix contract
    val w = lit(16L) + id % 100
    val h = lit(16L) + (id * 7) % 100
    val png = concat(unhex(lit("89504E470D0A1A0A")), be32(lit(13L)),
      asc("IHDR"), be32(w), be32(h))
    // Ogg/Opus: BOS page (27-byte header, 1 segment of 19 = OpusHead)
    // followed by a bare EOS page whose granule encodes the duration at
    // the spec's fixed 48 kHz granule clock; preSkip rides the header
    // and is subtracted by the walk, so granule = 48000·secs + preSkip
    // round-trips to exactly secs·1000 ms
    val preSkip = lit(312L)
    val opusRate = lit(12000L) * (lit(1L) + id % 4)
    val opusSecs = lit(1L) + id % 5
    val granule = lit(48000L) * opusSecs + preSkip
    val opus = concat(
      asc("OggS"), unhex(lit("00")), unhex(lit("02")), // ver 0, BOS flag
      unhex(lit("0000000000000000")),                  // granule 0
      le32(id % 65536), le32(lit(0L)), le32(lit(0L)),  // serial, seq, crc
      u8(lit(1L)), u8(lit(19L)),                       // 1 segment of 19
      asc("OpusHead"), u8(lit(1L)), u8(chn),           // version 1, channels
      le16(preSkip), le32(opusRate),
      unhex(lit("0000")), unhex(lit("00")),            // gain 0, family 0
      asc("OggS"), unhex(lit("00")), unhex(lit("04")), // EOS flag
      le32(granule), unhex(lit("00000000")),           // granule (64-bit LE)
      le32(id % 65536), le32(lit(1L)), le32(lit(0L)),  // serial, seq, crc
      u8(lit(0L)))                                     // empty segment table
    // MP4: one moov box wrapping one version-0 mvhd (ver+flags, ctime,
    // mtime, then the timescale/duration pair the walk divides)
    val timescale = lit(600L) * (lit(1L) + id % 3)
    val mp4Secs = lit(2L) + id % 6
    val mp4 = concat(
      be32(lit(36L)), asc("moov"),
      be32(lit(28L)), asc("mvhd"),
      unhex(lit("00000000")), be32(lit(0L)), be32(lit(0L)),
      be32(timescale), be32(timescale * mp4Secs))
    // webm (round 13): EBML header + Segment{Info{TimestampScale 1e6,
    // Duration f32}, Tracks{audio entry, video entry}} with all VINT
    // sizes constant (fixed layout) except the two float payloads.
    // Duration ticks are POWERS OF TWO so the float32 encodes as pure
    // exponent arithmetic ((127+e)·2²³ — no mantissa construction in
    // SQL), and the sample rate cycles 4 exact-float constants embedded
    // as IEEE hex literals; at timescale 10⁶ ns the walk's ms == 2^e.
    val e2 = lit(10L) + id % 6
    val durBits = (lit(127L) + e2) * lit(8388608L)
    val sfreqBytes = when(id % 4 === 0, unhex(lit("45FA0000"))) //  8000
      .when(id % 4 === 1, unhex(lit("467A0000")))               // 16000
      .when(id % 4 === 2, unhex(lit("46BB8000")))               // 24000
      .otherwise(unhex(lit("46FA0000")))                        // 32000
    def be16(v: Column) = unhex(lpad(hex(v), 4, "0"))
    val wpx = lit(100L) + id % 1000
    val hpx = lit(100L) + (id * 3) % 1000
    val webm = concat(
      unhex(lit("1A45DFA387428284")), asc("webm"),
      unhex(lit("18538067B7")),
      unhex(lit("1549A9668E")),
      unhex(lit("2AD7B1830F4240")),
      unhex(lit("448984")), be32(durBits),
      unhex(lit("1654AE6B9F")),
      unhex(lit("AE8E")), unhex(lit("838102")),
      unhex(lit("E189")),
      unhex(lit("B584")), sfreqBytes,
      unhex(lit("9F81")), u8(lit(1L) + id % 2),
      unhex(lit("AE8D")), unhex(lit("838101")),
      unhex(lit("E088")),
      unhex(lit("B082")), be16(wpx),
      unhex(lit("BA82")), be16(hpx))
    // WebP (round 13): id-parity picks the layout — even ids build the
    // extended VP8X canvas (u24 LE dims), odd ids the lossless VP8L
    // packed u32 ((h−1)<<14 | (w−1)) — so BOTH bit layouts of the
    // round-13 chunk walk sit under the hash gate, and the junk arm
    // keeps covering the no-magic refusal
    val wwp = lit(100L) + id % 500
    val hwp = lit(100L) + (id * 11) % 500
    def le24(v: Column) = {
      val hh = lpad(hex(v), 6, "0")
      unhex(concat(substring(hh, 5, 2), substring(hh, 3, 2),
        substring(hh, 1, 2)))
    }
    val webpX = concat(asc("RIFF"), le32(lit(22L)), asc("WEBP"),
      asc("VP8X"), le32(lit(10L)), unhex(lit("00000000")),
      le24(wwp - 1), le24(hwp - 1))
    val webpL = concat(asc("RIFF"), le32(lit(18L)), asc("WEBP"),
      asc("VP8L"), le32(lit(5L)), unhex(lit("2F")),
      le32((hwp - 1) * lit(16384L) + (wwp - 1)), u8(lit(0L))) // even pad
    val webp = when(id % 2 === 0, webpX).otherwise(webpL)
    // FLAC (round 14): fLaC magic + last-block STREAMINFO (type 0, 34
    // bytes) packing rate (20 bits), channels−1 (3), bits−1 (5), total
    // samples (36) across bytes 10–17 — the bit-sliced layout the walk
    // unpacks; total = rate·secs so duration round-trips to secs·1000
    val flacRate = lit(16000L) * (lit(1L) + id % 3)
    val flacCh = lit(1L) + id % 2
    val flacBits = lit(16L) + lit(8L) * (id % 2)
    val flacSecs = lit(1L) + id % 5
    val flacTotal = flacRate * flacSecs // < 2³² — the 36-bit top nibble is 0
    val flac = concat(asc("fLaC"),
      unhex(lit("80000022")),            // last-block flag, type 0, len 34
      unhex(lit("10001000")),            // min/max blocksize 4096
      unhex(lit("000000000000")),        // min/max frame size unknown
      u8(flacRate / 4096L),              // rate bits 19..12
      u8((flacRate / 16L) % 256L),       // rate bits 11..4
      u8((flacRate % 16L) * 16L + (flacCh - 1L) * 2L + (flacBits - 1L) / 16L),
      u8(((flacBits - 1L) % 16L) * 16L), // + total-samples top nibble (0)
      be32(flacTotal),                   // total samples low 32 bits
      unhex(lit("0" * 32)))              // 16-byte md5 signature (unset)
    // MP3 (round 14): one V1 Layer-III frame header (no CRC) whose Xing
    // tag at the exact side-info offset provides the corroboration the
    // sniffer demands AND the frame count its duration rule divides
    val mp3SrIdx = id % 3 // 0→44100, 1→48000, 2→32000 (V1 table)
    val mp3Sr = when(mp3SrIdx === 0, 44100L).when(mp3SrIdx === 1, 48000L)
      .otherwise(32000L)
    val mp3Mono = id % 2 === 0
    val mp3Frames = lit(100L) * (lit(1L) + id % 4)
    val mp3 = concat(u8(lit(255L)), u8(lit(251L)),       // sync, V1, L3, no CRC
      u8(lit(144L) + mp3SrIdx * 4L),                     // bitrate 128k, sr idx
      when(mp3Mono, u8(lit(192L))).otherwise(u8(lit(0L))), // mode bits
      when(mp3Mono, unhex(lit("0" * 34)))                // side info: 17 B mono
        .otherwise(unhex(lit("0" * 64))),                // 32 B stereo
      asc("Xing"), be32(lit(1L)), be32(mp3Frames))       // FRAMES flag + count
    // JPEG (round 14): SOI + APP1/Exif (big-endian TIFF, one IFD0 entry:
    // tag 0x0112 orientation) + SOF0 carrying precision/height/width —
    // both variable-offset walks (JpegDims + JpegExifOrientation) under
    // the hash gate at once
    val jw = lit(16L) + id % 200
    val jh = lit(16L) + (id * 13) % 200
    val jorient = lit(1L) + id % 8
    val jpeg = concat(unhex(lit("FFD8")),
      unhex(lit("FFE1")), be16(lit(34L)), asc("Exif"), unhex(lit("0000")),
      unhex(lit("4D4D002A00000008")),    // "MM", 42, IFD0 at offset 8
      be16(lit(1L)),                     // one directory entry
      be16(lit(274L)), be16(lit(3L)), be32(lit(1L)), // tag 0x0112, SHORT, ×1
      be16(jorient), be16(lit(0L)),
      be32(lit(0L)),                     // next-IFD pointer: none
      unhex(lit("FFC0")), be16(lit(11L)), u8(lit(8L)),
      be16(jh), be16(jw), u8(lit(1L)))
    // BMP (round 14): header-only BITMAPINFOHEADER — fixed-offset dims
    // incl. the NEGATIVE-height top-down convention on odd ids, so
    // leS32Abs's two's-complement branch sits under the hash gate
    val bw = lit(9L) + id % 300
    val bh = lit(8L) + (id * 17) % 300
    val bhRaw = when(id % 2 === 0, bh).otherwise(lit(4294967296L) - bh)
    val bmp = concat(asc("BM"), le32(lit(54L)), le32(lit(0L)), le32(lit(54L)),
      le32(lit(40L)), le32(bw), le32(bhRaw), le16(lit(1L)), le16(lit(24L)),
      le32(lit(0L)), le32(lit(0L)), le32(lit(2835L)), le32(lit(2835L)),
      le32(lit(0L)), le32(lit(0L)))
    // GIF (round 14, second wave): logical-screen u16 LE dims right
    // after the magic — both GIF89a and GIF87a magics cycle by parity
    val gw = lit(10L) + id % 400
    val gh = lit(10L) + (id * 19) % 400
    val gif = concat(
      when(id % 2 === 0, asc("GIF89a")).otherwise(asc("GIF87a")),
      le16(gw), le16(gh))
    // BMP with a 12-byte BITMAPCOREHEADER (round 14, second wave): the
    // dims live at DIFFERENT offsets in CORE files, so the walk must
    // refuse them (dib < 40 → all-NULL row) rather than read garbage —
    // the documented refusal path, now under the hash gate
    val bmpCore = concat(asc("BM"), le32(lit(26L)), le32(lit(0L)),
      le32(lit(26L)), le32(lit(12L)), le16(lit(20L)), le16(lit(20L)),
      le16(lit(1L)), le16(lit(24L)))
    // round 14: the cycle grows mod 7 → mod 11 → mod 13 (prime, so
    // every id % m parameter above still varies across each arm's
    // residue class)
    val content = when(id % 13 === 0, wav)
      .when(id % 13 === 1, png)
      .when(id % 13 === 2, opus)
      .when(id % 13 === 3, mp4)
      .when(id % 13 === 4, webm)
      .when(id % 13 === 5, webp)
      .when(id % 13 === 6, flac)
      .when(id % 13 === 7, mp3)
      .when(id % 13 === 8, jpeg)
      .when(id % 13 === 9, bmp)
      .when(id % 13 === 10, gif)
      .when(id % 13 === 11, bmpCore) // parseable-looking, must refuse
      .otherwise(md5(id.cast("string")).cast("binary")) // no magic anywhere
    val built = docs.withColumn("content", content)
    graft.multimodal.Multimodal.mediaMetaPlan(
        graft.multimodal.Multimodal.imageDimsPlan(built, "content"), "content")
      .select(col("doc_id"), col("media_format"),
        col("audio_sample_rate_hz"), col("audio_channels"),
        col("audio_bits"), col("media_duration_ms"),
        col("media_video_width"), col("media_video_height"),
        col("img_format"), col("img_width"), col("img_height"),
        col("img_orientation"))
      .orderBy("doc_id")
  }

  /** Shared PII patterns (c6): plain character-class/quantifier regexes
    * that parse identically under Java regex (Spark) and RE2 (DuckDB) —
    * no lookarounds, no backrefs, no dialect-specific escapes.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumRe = "[0-9]{6,}"

  /** c6: PII redaction — the scrub pass every training-data pipeline runs
    * before anything else. Emails and long digit runs are replaced with
    * typed placeholder tokens; the query reports per-document match counts
    * and an md5 fingerprint of the redacted text (the fingerprint, not the
    * full redacted body, is what the correctness gate hashes — the same
    * small-shuffle-row discipline as d8). Pure per-row codegen'd
    * expressions: scan-parallel, zero shuffles before the final sort, so
    * throughput is scan-bound at any corpus size.
    */
  /** The c6 projection on any (doc_id, text) frame — STATELESS per-row
    * expressions, so the identical code runs batch or under readStream
    * (CsvStreamSpec pins the parity). lit() pattern columns, not expr()
    * SQL literals: Spark's SQL string parser would eat the single
    * backslash in `\.` (escapedStringLiterals is off by default),
    * silently turning the anchor-dot into match-any.
    */
  def piiRedact(docs: DataFrame): DataFrame = {
    val emailRedacted = regexp_replace(col("text"), EmailRe, "<EMAIL>")
    val redacted = regexp_replace(emailRedacted, LongNumRe, "<NUM>")
    // n_longnum counts on the EMAIL-REDACTED text — the same text the
    // <NUM> replacement runs on — so every reported count corresponds to
    // an emitted placeholder (a digit run inside an email address is the
    // email's redaction, not a phantom <NUM>).
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(emailRedacted, lit(LongNumRe), lit(0)))
        .cast("long").as("n_longnum"),
      md5(redacted.cast("binary")).as("redacted_fp"))
  }

  def c6PiiRedact(spark: SparkSession, sfDir: String): DataFrame =
    piiRedact(Tables(spark, sfDir, "documents")).orderBy("doc_id")

  /** c7: asymmetric near-dup CONTAINMENT — c2 finds pairs that are
    * mutually similar (Jaccard is symmetric); containment |A∩B| / |A|
    * catches a short document quoted inside a long one, which Jaccard
    * misses (the union dwarfs the intersection). Same inverted shingle
    * index as c2; the verdict is different: keep pairs where EITHER
    * direction's containment ≥ 0.9. The threshold is evaluated as an
    * INTEGER cross-multiplication (10·common ≥ 9·size) — exact on both
    * engines, no float boundary — and the reported fractions are
    * `(c·10⁴) div n` fixed-point for the same reason. Scale path: the
    * symmetric case goes through d1's MinHash banding; containment's
    * sketch analog is a MinHash CONTAINMENT estimate (|A∩B|/|A| from the
    * same signatures) over the same candidate pairs — the index shape
    * does not change.
    */
  def c7Containment(spark: SparkSession, sfDir: String): DataFrame =
    pairOverlap(spark, sfDir)
      .filter(col("c") * 10 >= col("na") * 9 || col("c") * 10 >= col("nb") * 9)
      .select(col("doc_a"), col("doc_b"),
        expr("(c * 10000) div na").as("cont_a_fp"),
        expr("(c * 10000) div nb").as("cont_b_fp"))
      .orderBy("doc_a", "doc_b")

  /** c9: media corpus card — d68's data-card at the media modality, and
    * the walks under AGGREGATION: c8's decoded metadata frame censused
    * per (media_format, img_format) cell with exact integer volume
    * sums (asset counts, audio assets + total sample-rate and duration,
    * image assets + total pixels). The junk and refused arms land in
    * the (NULL, NULL) cell — the report SHOWS the unparseable tail
    * instead of dropping it, which is what a real corpus card needs.
    * Null group keys sort explicitly NULLS FIRST on both engines (their
    * defaults differ — the one hash-relevant ordering trap in grouped
    * nullable keys).
    */
  def c9MediaCard(spark: SparkSession, sfDir: String): DataFrame =
    c8MediaMeta(spark, sfDir)
      .groupBy("media_format", "img_format")
      .agg(count(lit(1)).as("n_assets"),
        count(col("audio_sample_rate_hz")).as("n_audio"),
        sum(coalesce(col("audio_sample_rate_hz"), lit(0L))).as("sum_rate_hz"),
        sum(coalesce(col("media_duration_ms"), lit(0L)))
          .as("sum_duration_ms"),
        count(col("img_width")).as("n_img"),
        sum(coalesce(col("img_width") * col("img_height"), lit(0L)))
          .as("sum_img_px"))
      .orderBy(col("media_format").asc_nulls_first,
        col("img_format").asc_nulls_first)

  // --- c11/c12: markup→text extraction (round 18) ------------------------
  // Stage 0 of every real crawl pipeline: most training-data corpora
  // arrive as HTML, and nothing downstream (Gopher gates, dedup,
  // tokenization) is meaningful over tag soup. The reference family's own
  // persistence layer is XML (/root/reference/src/CSVProvider.cs:363-454),
  // so markup handling is native to this provider's world; a12 exercises
  // XML as a data FORMAT — c11 treats markup as CONTENT.

  /** Deterministic HTML construction over `documents`: each doc's text
    * wrapped in a realistic page — head with title, a `<style>` block, a
    * `<script>` block whose body contains `<`/`&&` (the classic tag-soup
    * trap: script bodies must be stripped as BLOCKS before any generic
    * tag pass, or `if (id < 2 && id > 0)` reads as a tag), a comment,
    * entity-encoded punctuation (the 5 core entities, with `&amp;`
    * decoded LAST so `&amp;lt;` single-decodes to `&lt;`, not `<`), and
    * attribute-carrying tags. Parts are shared with [[c11HtmlSql]]
    * through one literal list so the two engines can never drift.
    */
  private val IdPart = "\u0001"   // sentinel: doc_id as string
  private val TextPart = "\u0002" // sentinel: the document text column
  private val UrlPart = "\u0003"  // sentinel: the doc's own c13 raw URL (r19)
  private[queries] val c11Parts: Seq[String] = Seq(
    "<html><head><title>Doc ", IdPart, "</title>",
    "<style type=\"text/css\">body { color: #000; margin: 0; }</style>",
    "<script>var id = ", IdPart,
    "; if (id < 2 && id > 0) { id = id * 2; }</script>",
    "</head><body><h1 class=\"t\">Doc ", IdPart, "</h1>",
    "<!-- generated ", IdPart, " -->",
    "<p>Tom &amp; Jerry say &quot;hi&quot; &#39;n&#39; &lt;tag", IdPart,
    "&gt;</p>",
    // r19: the numeric/named reference block — each common ref appears
    // DECODED (bare) and KEPT (behind `&amp;`, which single-decodes to
    // the literal ref text so the chain's one-pass contract is visible
    // in the output): nbsp family collapses into plain spaces, smart
    // punctuation lands as the real characters.
    "<p>it&#8217;s &#x2019;q&#x2019; &#x27;h&#x27; &#8216;u&apos; &#8220;w",
    IdPart,
    "&#8221; a&#8211;b c&#8212;d etc&#8230; more&hellip; nb&#160;sp&nbsp;x",
    "&#xa0;y&#xA0;z &lsquo;m&rsquo; &ldquo;n&rdquo; e&ndash;f g&mdash;h",
    " &amp;#8217; &amp;nbsp; &amp;ndash; kept</p>",
    "<p id=\"b\">", TextPart, "</p>",
    "<a href=\"http://example.com/", IdPart, "\">link ", IdPart, "</a>",
    "</body></html>")

  private[queries] def partsHtml(parts: Seq[String]): Column = concat(parts.map {
    case IdPart   => col("doc_id").cast("string")
    case TextPart => col("text")
    case UrlPart  => c13Url
    case s        => lit(s)
  }: _*)

  /** The identical construction as DuckDB SQL (literals carry no single
    * quotes by construction, so no escaping layer is needed). */
  private[queries] def partsHtmlSql(parts: Seq[String]): String = parts.map {
    case IdPart   => "CAST(doc_id AS VARCHAR)"
    case TextPart => "text"
    case UrlPart  => s"(${c13UrlSql(e => s"CAST($e AS VARCHAR)")})"
    case s        => s"'$s'"
  }.mkString(" || ")

  /** The c11 page as a Column — [[graft.streaming.StreamCrawlIngest]]'s
    * spec renders the same corpus d96 declares (the frontierHtml
    * discipline, r20). */
  private[graft] def c11Html: Column = partsHtml(c11Parts)
  private def c11HtmlSql: String = partsHtmlSql(c11Parts)

  /** The extraction chain, shared order both sides: strip script/style
    * BLOCKS (lazy-dot-all — the block bodies may hold `<`), strip
    * comments, strip remaining tags (each strip inserts a space so
    * adjacent words never fuse), decode the 5 core entities (`&amp;`
    * last — single-decode), collapse whitespace, trim. Every pattern is
    * valid and identical under Java regex (Spark) and RE2 (DuckDB):
    * inline `(?si)`, lazy `.*?`, `[^>]` classes and `\s` all agree on
    * this construction's character set.
    *
    * Order and flags carry real semantics (r18 review): the block
    * patterns are `(?i)` because HTML tag names are case-insensitive
    * (`<SCRIPT>` leaking its body into "clean" text was a live bug),
    * and COMMENTS strip before script/style so a commented-out opener
    * (`<!--<script>-->`, the common way to disable a block) cannot
    * swallow legitimate content up to some later real `</script>`.
    * The reverse failure (a literal `-->` inside a live script body
    * truncating the comment strip) needs `-->` in JS source text —
    * far rarer than commented-out blocks, and HTML tokenization itself
    * treats `<!--` at top level as opening a comment. A regexp chain
    * cannot get both cases right (HTML is not regular); this order
    * matches the tokenizer on the common case.
    */
  private val markupStripPatterns = Seq(
    "(?s)<!--.*?-->",
    "(?si)<script[^>]*>.*?</script>",
    "(?si)<style[^>]*>.*?</style>",
    "<[^>]+>")

  /** Whitespace-collapse class, shared verbatim by both engines (r19
    * ADVICE): spelled out as an explicit character class because Java's
    * `\s` includes `\x0B` (vertical tab) while RE2's `\s` is
    * `[\t\n\f\r ]` — a document carrying `\x0B` would collapse on the
    * Spark side but not in the oracle. The explicit class is valid and
    * IDENTICAL under both engines, restoring the "every shared pattern
    * means the same thing in Java regex and RE2" invariant on
    * adversarial input (the constructed corpus never hits it).
    */
  private val MarkupWsP = "[ \\t\\n\\x0B\\f\\r]+"

  /** Entity decode pairs — the 5 named core entities plus the numeric
    * character references most common in crawl HTML (r19: smart
    * quotes/apostrophes, dashes, ellipsis, non-breaking space — the refs
    * that otherwise survive as literal `&#...;` text and pollute every
    * downstream token statistic: d69 symbol pressure, d7 counts). All
    * LITERAL replace pairs (`replace()` is identical in Spark and
    * DuckDB — the dialect-portable c11 discipline; a general `&#\d+;`
    * decoder would need per-engine char-from-codepoint functions).
    *
    * Order carries semantics: no pair's REPLACEMENT contains `&`, so no
    * replacement can create a match for a later pattern — EXCEPT
    * `&amp;` → `&`, which therefore decodes LAST (single-decode:
    * `&amp;lt;` → `&lt;` kept as text, never `<`; `&amp;#8217;` →
    * `&#8217;` kept, because the numeric pairs already ran). The
    * numeric-ref encodings of `&` itself (`&#38;`/`&#x26;`) are
    * deliberately ABSENT: two amp-producing pairs cannot both be
    * single-decode-safe against each other in a replace chain (whichever
    * runs second re-decodes the first's output), and `&amp;` dominates
    * them in the wild. `&#160;`/`&nbsp;` decode to a PLAIN space: U+00A0
    * is outside both engines' whitespace classes, so carrying the real
    * nbsp through would make the collapse and every downstream token
    * split treat it as a word character — decoding to ' ' is the
    * standard extraction choice and identical in both engines.
    */
  private val markupEntities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&#x27;" -> "'", "&apos;" -> "'",
    "&nbsp;" -> " ", "&#160;" -> " ", "&#xa0;" -> " ", "&#xA0;" -> " ",
    "&#8216;" -> "‘", "&lsquo;" -> "‘",
    "&#8217;" -> "’", "&#x2019;" -> "’", "&rsquo;" -> "’",
    "&#8220;" -> "“", "&ldquo;" -> "“",
    "&#8221;" -> "”", "&rdquo;" -> "”",
    "&#8211;" -> "–", "&ndash;" -> "–",
    "&#8212;" -> "—", "&mdash;" -> "—",
    "&#8230;" -> "…", "&hellip;" -> "…",
    "&amp;" -> "&")

  /** Markup→text over any string column — c11's kernel, reusable in
    * front of every text operator (c12 feeds it into the Gopher gate).
    * Pure codegen'd regexp/replace chain: scan-side, zero shuffles.
    */
  def markupClean(c: Column): Column = {
    val stripped = markupStripPatterns.foldLeft(c)(
      (acc, p) => regexp_replace(acc, p, " "))
    val decoded = markupEntities.foldLeft(stripped) {
      case (acc, (ent, rep)) => replace(acc, lit(ent), lit(rep))
    }
    trim(regexp_replace(decoded, MarkupWsP, " "))
  }

  /** The identical chain as DuckDB SQL over expression `e` (DuckDB's
    * regexp_replace needs the explicit 'g' flag; Spark replaces all
    * matches by default — same semantics either way).
    */
  private[queries] def markupCleanSql(e: String): String = {
    val stripped = markupStripPatterns.foldLeft(e)(
      (acc, p) => s"regexp_replace($acc, '$p', ' ', 'g')")
    val decoded = markupEntities.foldLeft(stripped) {
      case (acc, (ent, rep)) =>
        val r = if (rep == "'") "''" else rep
        s"replace($acc, '$ent', '$r')"
    }
    s"trim(regexp_replace($decoded, '$MarkupWsP', ' ', 'g'))"
  }

  /** c11: markup→text extraction — the declared query: construct the
    * page, extract the `<title>` text and the cleaned body text, report
    * the cleaned length. `html` is an expensive expression referenced
    * twice (title + clean), which CollapseProject declines to duplicate
    * (non-cheap, multi-reference), so the construction evaluates once
    * per row without needing a barrier.
    *
    * Scale shape: a pure per-row projection — no shuffle, no state; at
    * 100 TB the page bytes come off the scan instead of being
    * constructed, and the chain rides whole-stage codegen unchanged.
    * The ORDER BY is presentation.
    */
  def c11MarkupExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), c11Html.as("html"))
      .select(col("doc_id"),
        regexp_extract(col("html"), "<title>(.*?)</title>", 1).as("title"),
        markupClean(col("html")).as("clean_text"))
      .withColumn("n_chars_clean", length(col("clean_text")).cast("long"))
      .orderBy("doc_id")

  /** c12: the stage-0 composition — c11's cleaned text fed straight into
    * d69's Gopher-rule gate (one shared body, [[GroupD.gopherOver]], so
    * the composed gate can never drift from the declared d69). This is
    * the shape a real crawl pipeline runs: markup-strip THEN quality
    * gate, because every Gopher statistic (word count, alpha fraction,
    * symbol pressure) is meaningless over tag soup. Referenced at call
    * time only — object-init stays acyclic (GroupD's init reads GroupC
    * vals, so GroupC's init must never read GroupD).
    */
  def c12MarkupGopher(spark: SparkSession, sfDir: String): DataFrame =
    GroupD.gopherOver(
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), c11Html.as("html"))
        .select(col("doc_id"), markupClean(col("html")).as("text")))

  // --- c13/d91: URL curation (round 18) ----------------------------------
  // The other stage-0 axis of crawl curation: before any content op runs,
  // a real pipeline dedups by CANONICAL URL and balances by DOMAIN (the
  // C4/RefinedWeb per-host discipline). `documents` carries no URL column,
  // so the corpus is CONSTRUCTED deterministically from doc_id (the
  // c8/c11 discipline: one shared template renders the same bytes in both
  // engines, and the oracle hash gate verifies the normalization kernel,
  // never trusting either side).

  /** One URL per doc, with every variance the normalizer must handle:
    * mixed-case scheme/host, optional `www.`, default ports (`:443` only
    * default under https — the CASE arms cross so both keep/drop arms of
    * each port are exercised), a non-default `:8080`, `/index.html`
    * tails, tracking params (`utm_*`/`fbclid`/`ref`) interleaved with
    * real ones, a tracking-ONLY query (the `?` must vanish entirely),
    * and fragments. The template is shared verbatim with the oracle via
    * the `str` cast hook (STRING vs VARCHAR is the only dialect delta).
    */
  private def c13UrlSql(str: String => String): String = Seq(
    "CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http' ELSE 'HtTp' END",
    "'://'",
    "CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END",
    "CASE WHEN doc_id % 9 = 0 THEN 'CDN.' ELSE '' END",
    "'Site-'", str("doc_id % 37"), "'.'",
    "CASE doc_id % 4 WHEN 0 THEN 'COM' WHEN 1 THEN 'com' " +
      "WHEN 2 THEN 'Org' ELSE 'net' END",
    "CASE doc_id % 5 WHEN 0 THEN ':443' WHEN 1 THEN ':80' " +
      "WHEN 2 THEN ':8080' ELSE '' END",
    "'/articles/'", str("doc_id % 100"),
    "CASE WHEN doc_id % 6 = 0 THEN '/index.html' " +
      "WHEN doc_id % 6 = 3 THEN '/' ELSE '' END",
    s"CASE WHEN doc_id % 11 = 0 THEN '?utm_medium=email' " +
      s"ELSE '?id=' || ${str("doc_id")} || " +
      "CASE WHEN doc_id % 2 = 0 THEN '&utm_source=feed&utm_campaign=x' " +
      "ELSE '' END || " +
      s"CASE WHEN doc_id % 7 = 0 THEN '&fbclid=abc' || ${str("doc_id")} " +
      "ELSE '' END || " +
      "CASE WHEN doc_id % 3 = 0 THEN '&ref=home' ELSE '' END END",
    s"CASE WHEN doc_id % 4 = 0 THEN '#section-' || ${str("doc_id % 9")} " +
      "ELSE '' END"
  ).mkString(" || ")

  private[queries] def c13Url: Column =
    expr(c13UrlSql(e => s"CAST($e AS STRING)"))

  /** The normalization kernel's patterns — one set of constants feeds
    * both engines ([.]/[?] classes instead of backslash escapes, so the
    * literals survive every quoting layer identically; all valid and
    * semantically identical under Java regex and RE2). End anchors are
    * `\z` (end of INPUT in both engines), not `$`: Java's default `$`
    * also matches before a trailing line terminator where RE2's does
    * not — `\z` removes that latent divergence for adversarial inputs
    * carrying newlines (the constructed corpus never does, but the
    * kernel is a reusable library surface). Port strip is `[0-9]*` —
    * zero digits included — because an EMPTY port (`host:`) is
    * identical to no port per the URI grammar, and leaving the bare
    * colon would split `http://h:/p` from `http://h/p`. Tracking strip
    * is `(?i)` (campaign links appear uppercase in the wild) and
    * allows underscores in the utm key (`utm_source_platform`).
    */
  private[queries] val UrlSchemeP   = "^([A-Za-z]+)://"
  private[queries] val UrlHostportP = "^[A-Za-z]+://([^/?#]*)"
  private[queries] val UrlRestP     = "^[A-Za-z]+://[^/?#]*([^#]*)"
  private[queries] val UrlPortStripP = ":[0-9]*\\z"
  private[queries] val UrlPortP     = ":([0-9]+)\\z"
  private[queries] val UrlPathP     = "^([^?]*)"
  private[queries] val UrlQueryP    = "[?](.*)\\z"
  private[queries] val UrlTrackingP =
    "(?i)(^|&)(utm_[a-z_]+|fbclid|gclid|ref)=[^&]*"
  private[queries] val UrlLeadAmpP  = "^&+"
  private[queries] val UrlIndexP    = "/index[.]html\\z"
  private[queries] val UrlWwwP      = "^(www[.])+"
  private[queries] val UrlDomainP   = "([^.]+[.][^.]+)\\z"
  private[queries] val UrlMultiColonP = ":[^:]*:"

  private def urlHostNorm(u: Column): Column =
    regexp_replace(regexp_replace(
      lower(regexp_extract(u, UrlHostportP, 1)), UrlPortStripP, ""),
      UrlWwwP, "")

  /** Canonical URL from a raw one: lowercase scheme+host, strip `www.`,
    * drop the port iff it is the scheme's default (443/https, 80/http),
    * strip a trailing `/index.html` to `/`, drop tracking params
    * (`utm_*`, `fbclid`, `gclid`, `ref`) and the `?` itself when nothing
    * survives, drop the fragment. Pure codegen'd regexp chain — a
    * scan-side projection, reusable in front of any URL-keyed dedup.
    *
    * REFUSED with NULL (the decoder discipline — junk never silently
    * canonicalizes to a colliding degenerate value; a NULL key drops
    * out of any dedup/cap join on its own): non-absolute input (no
    * `scheme://`), and a multi-colon authority (`h:80:80` — malformed
    * per the URI grammar's single optional port; bracketed IPv6 is out
    * of scope, so any second colon is junk, and stripping one port
    * would leave a colon-bearing host that re-strips on the next pass).
    * Idempotent on accepted input: every rewrite removes or lowers, and
    * nothing it emits re-matches a strip pattern (fuzz-pinned over an
    * adversarial corpus and spec-pinned on the constructed one).
    */
  def urlNormalize(u: Column): Column =
    when(urlRefused(u), lit(null)).otherwise(urlNormalizeAccepted(u))

  private[queries] def urlRefused(u: Column): Column =
    regexp_extract(u, UrlSchemeP, 1) === "" ||
      regexp_extract(regexp_extract(u, UrlHostportP, 1),
        UrlMultiColonP, 0) =!= ""

  private def urlNormalizeAccepted(u: Column): Column = {
    val scheme = lower(regexp_extract(u, UrlSchemeP, 1))
    val hostport = lower(regexp_extract(u, UrlHostportP, 1))
    val port = regexp_extract(hostport, UrlPortP, 1)
    val portN = when(port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val rest = regexp_extract(u, UrlRestP, 1)
    val path0 = regexp_extract(rest, UrlPathP, 1)
    val path = when(path0 === "", lit("/"))
      .otherwise(regexp_replace(path0, UrlIndexP, "/"))
    val qN = regexp_replace(
      regexp_replace(regexp_extract(rest, UrlQueryP, 1), UrlTrackingP, ""),
      UrlLeadAmpP, "")
    concat(scheme, lit("://"), urlHostNorm(u), portN, path,
      when(qN === "", lit("")).otherwise(concat(lit("?"), qN)))
  }

  /** Registered domain (last two host labels, after lowering and
    * stripping port + `www.`) — the per-host balancing key (d91).
    * Same refusal rule as [[urlNormalize]] (no scheme, multi-colon
    * authority → NULL), PLUS: a host with fewer than two labels
    * (`localhost`, intranet names, empty/degenerate authorities) HAS no
    * registered domain and returns NULL too (r18 review — the empty
    * string would pool every such doc into one giant degenerate group
    * in d91's cap, the exact collision the NULL discipline exists to
    * prevent; note [[urlNormalize]] still ACCEPTS these hosts — they
    * canonicalize fine, they just don't balance). */
  def urlDomain(u: Column): Column =
    when(urlRefused(u), lit(null))
      .otherwise(nullif(regexp_extract(urlHostNorm(u), UrlDomainP, 1),
        lit("")))

  /** c13: URL canonicalization — the declared query: construct each
    * doc's URL, emit the raw URL, its canonical form, and the registered
    * domain. Scale shape: a pure per-row projection, zero shuffles; the
    * `url` expression is non-cheap multi-reference, so CollapseProject
    * keeps it evaluated once per row (c11's plan argument).
    */
  def c13UrlNormalize(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), c13Url.as("url"))
      .select(col("doc_id"), col("url"),
        urlNormalize(col("url")).as("norm_url"),
        urlDomain(col("url")).as("domain"))
      .orderBy("doc_id")

  /** The oracle's normalization chain, CTE-staged, ending in relation
    * `n(doc_id$carry, url, norm_url, domain)` — shared by c13, d91
    * (which threads `, n_chars` through `carry`), d92 (which swaps in
    * its collision-corpus construction) and c14 (which points `from` at
    * its exploded-outlink relation). Every pattern is the SAME Scala
    * constant the Spark kernel compiles, and — r19 ADVICE — the chain
    * now carries the kernel's FULL NULL-domain discipline, not just the
    * happy path: the `refused` gate (no `scheme://`, multi-colon
    * authority → `norm_url` and `domain` both NULL — lowering changes
    * neither emptiness nor colon count, so testing the lowered scheme/
    * hostport is exactly the kernel's raw-input test) and
    * `NULLIF(domain, '')` (a sub-2-label host HAS no registered
    * domain). The constructed c13/d91/d92 corpora never refuse, so
    * their hashes are unchanged — but the CTE chain is a reusable
    * surface, and without the gate any future oracle reuse over
    * junk-bearing input (c14's relative hrefs are the first) would
    * silently diverge from the library kernel.
    */
  private[queries] def c13NormCtes(carry: String,
      construct: String = c13UrlSql(e => s"CAST($e AS VARCHAR)"),
      from: String = "documents",
      prefix: String = ""): String =
    s"""${prefix}u AS (SELECT doc_id$carry,
       |  $construct AS url FROM $from),
       |${prefix}p AS (SELECT doc_id$carry, url,
       |  lower(regexp_extract(url, '$UrlSchemeP', 1)) AS scheme,
       |  lower(regexp_extract(url, '$UrlHostportP', 1)) AS hostport,
       |  regexp_extract(url, '$UrlRestP', 1) AS rest FROM ${prefix}u),
       |${prefix}q AS (SELECT doc_id$carry, url, scheme,
       |  (scheme = '' OR
       |    regexp_extract(hostport, '$UrlMultiColonP', 0) <> '')
       |    AS refused,
       |  regexp_replace(regexp_replace(hostport, '$UrlPortStripP', ''),
       |    '$UrlWwwP', '') AS host_n,
       |  regexp_extract(hostport, '$UrlPortP', 1) AS port,
       |  regexp_extract(rest, '$UrlPathP', 1) AS path0,
       |  regexp_extract(rest, '$UrlQueryP', 1) AS q0 FROM ${prefix}p),
       |${prefix}r AS (SELECT doc_id$carry, url, scheme, refused, host_n,
       |  CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
       |       OR (scheme = 'http' AND port = '80') THEN ''
       |       ELSE ':' || port END AS port_n,
       |  CASE WHEN path0 = '' THEN '/'
       |       ELSE regexp_replace(path0, '$UrlIndexP', '/') END AS path,
       |  regexp_replace(regexp_replace(q0, '$UrlTrackingP', '', 'g'),
       |    '$UrlLeadAmpP', '') AS q_n FROM ${prefix}q),
       |${prefix}n AS (SELECT doc_id$carry, url,
       |  CASE WHEN refused THEN NULL ELSE
       |    scheme || '://' || host_n || port_n || path ||
       |      CASE WHEN q_n = '' THEN '' ELSE '?' || q_n END
       |  END AS norm_url,
       |  CASE WHEN refused THEN NULL
       |    ELSE NULLIF(regexp_extract(host_n, '$UrlDomainP', 1), '')
       |  END AS domain FROM ${prefix}r)"""
      .stripMargin

  /** [[urlDomain]]'s full rule as DuckDB SQL over expression `e` — the
    * refusal CASE + NULLIF discipline verbatim, for oracles that need
    * the registered domain of an ALREADY-canonical URL (d95's frontier
    * grouping) without re-running the whole CTE chain. */
  private[queries] def urlDomainSql(e: String): String =
    s"""CASE WHEN lower(regexp_extract($e, '$UrlSchemeP', 1)) = ''
       |    OR regexp_extract(lower(regexp_extract($e, '$UrlHostportP', 1)),
       |         '$UrlMultiColonP', 0) <> '' THEN NULL
       |  ELSE NULLIF(regexp_extract(regexp_replace(regexp_replace(
       |    lower(regexp_extract($e, '$UrlHostportP', 1)),
       |    '$UrlPortStripP', ''), '$UrlWwwP', ''), '$UrlDomainP', 1), '')
       |END""".stripMargin

  /** d92's collision-bearing URL corpus: doc pairs (2k, 2k+1) share one
    * page identity (every CONTENT arm — host, path id, query id — keys
    * off `base = doc_id - doc_id % 2`) but differ in SURFACE form
    * (every doc_id-keyed arm is normalization-invariant: scheme case,
    * `www.`, the scheme-default port, `/index.html` vs `/`, a tracking
    * param, a fragment). The two raw URLs are distinct strings whose
    * canonical forms are IDENTICAL — the corpus shape exact URL dedup
    * exists for. Same template discipline as [[c13UrlSql]].
    */
  private def d92UrlSql(str: String => String): String = Seq(
    "CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END",
    "'://'",
    "CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END",
    "'Site-'", str("(doc_id - doc_id % 2) % 37"), "'.'",
    "CASE (doc_id - doc_id % 2) % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org' " +
      "WHEN 2 THEN 'net' ELSE 'io' END",
    "CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END",
    "'/articles/'", str("(doc_id - doc_id % 2) % 100"),
    "CASE WHEN doc_id % 2 = 0 THEN '/index.html' ELSE '/' END",
    s"'?id=' || ${str("doc_id - doc_id % 2")}",
    "CASE WHEN doc_id % 2 = 0 THEN '&utm_source=feed' ELSE '' END",
    "CASE WHEN doc_id % 2 = 0 THEN '#top' ELSE '' END"
  ).mkString(" || ")

  private[graft] def d92Url: Column =
    expr(d92UrlSql(e => s"CAST($e AS STRING)"))

  /** d92's oracle CTE: the collision corpus through the SAME
    * normalization chain as c13 (relation
    * `n(doc_id$carry, url, norm_url, domain)`; d93 threads `, n_chars`
    * through `carry` for its cap stage). */
  private[queries] def d92NormCtesCarry(carry: String): String =
    c13NormCtes(carry, d92UrlSql(e => s"CAST($e AS VARCHAR)"))
  private[queries] def d92NormCtes: String = d92NormCtesCarry("")

  // --- c14: outlink harvest (round 19) -----------------------------------
  // The crawl-frontier operator bridging the two stage-0 axes: c11's pages
  // already carry <a href> anchors; harvesting their targets through c13's
  // canonicalization kernel is how a crawler discovers URLs. Per-doc
  // outlink statistics — link count, DISTINCT canonical targets (surface
  // variants of one page must collapse), and the lexicographically first
  // canonical target as the deterministic representative.

  /** The anchor block appended inside c11's page body for the outlink
    * corpus — one href per discipline arm: (1) a SURFACE-variant absolute
    * URL (uppercase scheme/host, `www.`, the https-default `:443`,
    * `/index.html`, a tracking-only query), (2) the same target in plain
    * canonical form — the pair collapses under c13's kernel, so
    * n_canon < n_links by construction, (3) a cross-domain link keeping a
    * real param while dropping `fbclid` and the fragment, (4) a RELATIVE
    * href — the refusal arm: no `scheme://`, so urlNormalize yields NULL
    * and the link counts toward n_links but never toward canonical
    * targets. Plus c11's own `example.com` anchor (5 links per page).
    */
  private val c14AnchorParts: Seq[String] = Seq(
    "<nav><a href=\"HTTPS://WWW.Out-", IdPart,
    ".Org:443/read/", IdPart, "/index.html?utm_campaign=x\">v1</a>",
    "<a href=\"https://out-", IdPart, ".org/read/", IdPart, "/\">v2</a>",
    "<a href=\"http://Ref-", IdPart, ".net:8080/r?id=", IdPart,
    "&fbclid=z#frag\">x</a>",
    "<a href=\"/local/about\">rel</a></nav>")

  /** c11's page with the anchor block spliced in before `</body>` —
    * shared verbatim with the oracle through the same parts list. */
  private val c14Parts: Seq[String] =
    c11Parts.init ++ c14AnchorParts :+ c11Parts.last

  /** c14's page plus a SELF-LINK anchor (the d95 frontier corpus) whose href is the doc's OWN raw
    * c13 URL (surface form — pages linking to themselves are the most
    * common outlink in real crawls): the arm that proves d95's frontier
    * diff drops already-known pages, because the self-link's canonical
    * form equals the corpus page's canonical form by construction. */
  private[queries] val frontierParts: Seq[String] =
    c11Parts.init ++ c14AnchorParts ++
      Seq("<a href=\"", UrlPart, "\">self</a>") :+ c11Parts.last

  /** The c15 page as a Column — [[StreamFrontier]]'s spec renders the
    * same corpus d95 declares (r19). */
  private[graft] def frontierHtml: Column = partsHtml(frontierParts)

  /** Shared href pattern — double-quoted attribute values only (the
    * constructed corpus uses them exclusively), identical under Java
    * regex and RE2. */
  private[graft] val HrefP = "href=\"([^\"]*)\""

  /** c14: outlink harvest — construct the page, extract every href,
    * canonicalize each through [[urlNormalize]], report per-doc link
    * count, distinct canonical target count, and the lexicographically
    * first canonical target.
    *
    * Scale shape: ZERO shuffles up to the presentation sort — the
    * extract → transform → distinct → min pipeline runs entirely inside
    * the row's own projection (`links`/`canon` are non-cheap
    * multi-reference columns, so CollapseProject keeps each evaluated
    * once per row — c11's plan argument); no explode, so the per-doc
    * link lists never hit an exchange. At 100 TB the frontier-dedup step
    * that FOLLOWS this (explode + d92's canonical-URL dedup) is the
    * shuffle, and it ships only the canonical strings this operator
    * already reduced.
    */
  def c14OutlinkHarvest(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), partsHtml(c14Parts).as("html"))
      .select(col("doc_id"),
        regexp_extract_all(col("html"), lit(HrefP), lit(1)).as("links"))
      .select(col("doc_id"),
        size(col("links")).cast("long").as("n_links"),
        array_distinct(filter(
          transform(col("links"), u => urlNormalize(u)),
          u => u.isNotNull)).as("canon"))
      .select(col("doc_id"), col("n_links"),
        size(col("canon")).cast("long").as("n_canon"),
        array_min(col("canon")).as("min_target"))
      .orderBy("doc_id")

  // --- c15: robots.txt fetch-policy gate (round 19) -----------------------
  // The crawl loop's remaining leg: harvest (c14) and frontier diff (d95)
  // decide WHAT to fetch; robots.txt decides what a polite crawler MAY
  // fetch. The Spark side PARSES a constructed robots.txt (the
  // constructed-bytes discipline: the oracle re-derives every decision
  // arithmetically from doc_id and never parses the text, so the hash
  // gate verifies the parser itself).

  /** Per-doc robots.txt, shared template both engines (the c13UrlSql
    * hook pattern; newlines spelled `chr(10)` — identical in Spark SQL
    * and DuckDB, dodging the engines' different literal-escape rules).
    * Rules derive from the doc's c13 domain key (doc_id % 37): an
    * optional BLANKET `Disallow: /articles/` (1 domain in 4 — the rule
    * LIST varies per domain, so the parser's fold is exercised over
    * different cardinalities), a specific `Disallow: /articles/<k>`
    * (string-prefix semantics: digit k blocks ids k, k0–k9 …), a
    * never-matching `Disallow: /private`, and a LONGER
    * `Allow: /articles/<k><m>` exception that must win by
    * longest-match precedence (RFC 9309 §2.2.2).
    */
  private def c15RobotsSql(str: String => String): String = Seq(
    "'User-agent: *'", "chr(10)",
    "CASE WHEN (doc_id % 37) % 4 = 0 " +
      "THEN 'Disallow: /articles/' || chr(10) ELSE '' END",
    "'Disallow: /articles/'", str("(doc_id % 37) % 10"), "chr(10)",
    "'Disallow: /private'", "chr(10)",
    "'Allow: /articles/'", str("(doc_id % 37) % 10"),
    str("(doc_id % 37) % 3"), "chr(10)",
    "'Crawl-delay: '", str("1 + (doc_id % 37) % 9"), "chr(10)"
  ).mkString(" || ")

  /** The robots rule-extraction patterns — line-anchored (`(?m)^` —
    * without the anchor `Allow:` also matches the tail of every
    * `Disallow:` line, the classic robots-parsing bug). Shared with
    * d97's host-grouped evaluation. */
  private[graft] val RobotsDisP   = "(?m)^Disallow: (\\S+)"
  private[graft] val RobotsAlwP   = "(?m)^Allow: (\\S+)"
  // line-anchored like the rule patterns (r20 review): unanchored, a
  // commented-out "# Crawl-delay: 60" earlier in the file would win
  private[graft] val RobotsDelayP = "(?m)^Crawl-delay: ([0-9]+)"

  /** Longest matching prefix length among `rules` for `path` — the RFC
    * 9309 match rule as one HOF fold (0 = no rule matches). Shared with
    * d97 (host-grouped evaluation over the frontier). */
  private[graft] def c15BestLen(rules: Column, path: Column): Column =
    aggregate(filter(rules, p => path.startsWith(p)), lit(0L),
      (acc, p) => greatest(acc, length(p).cast("long")))

  /** The numeric HOST key shared by d97's robots construction, c17's
    * urlset construction and their specs: the domain's embedded digit
    * run mod 37 (digit-free domains key 0) — ONE definition so the
    * constructions cannot drift (r20 review). The run is length-gated
    * before the cast (the warcWalk cLen discipline): a ≥ 16-digit run
    * would overflow the ANSI cast and kill the query instead of keying
    * 0 — reachable only on non-constructed domains. */
  private[graft] def hostKey(domain: Column): Column = {
    val d = regexp_extract(domain, "([0-9]+)", 1)
    coalesce(when(length(d).between(1, 15), d.cast("long")), lit(0L)) % 37
  }

  /** c15: robots.txt fetch-policy gate — construct each doc's robots.txt
    * and its article path, PARSE the rule groups with line-anchored
    * extraction (`(?m)^Allow:` — without the anchor the pattern also
    * matches the tail of every `Disallow:` line, the classic robots-
    * parsing bug), apply longest-match precedence (ties to Allow, the
    * RFC default-allow for unmatched paths falling out as 0 ≥ 0), and
    * report the decision with both matched lengths and the crawl delay
    * so a curator sees WHICH rule fired.
    *
    * Scale shape: a pure per-row projection — the robots text is
    * non-cheap multi-reference (three extractions), so CollapseProject
    * keeps it evaluated once per row (c11's plan argument); zero
    * shuffles up to the presentation sort. At 100 TB robots.txt arrives
    * once per HOST, not per doc — the real pipeline parses the
    * host-grouped frame (domains-sized, d91's key) and broadcast-joins
    * the decisions back; the kernel is the same either way.
    */
  def c15RobotsGate(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        concat(lit("/articles/"), (col("doc_id") % 100).cast("string"))
          .as("path"),
        expr(c15RobotsSql(e => s"CAST($e AS STRING)")).as("robots"))
      .select(col("doc_id"), col("path"),
        regexp_extract_all(col("robots"), lit(RobotsDisP), lit(1)).as("dis"),
        regexp_extract_all(col("robots"), lit(RobotsAlwP), lit(1)).as("alw"),
        regexp_extract(col("robots"), RobotsDelayP, 1)
          .cast("long").as("crawl_delay_s"))
      .select(col("doc_id"), col("path"),
        c15BestLen(col("dis"), col("path")).as("best_disallow"),
        c15BestLen(col("alw"), col("path")).as("best_allow"),
        col("crawl_delay_s"))
      .withColumn("allowed", col("best_allow") >= col("best_disallow"))
      .orderBy("doc_id")

  // --- c16: WARC record ingest (round 20) ----------------------------------
  // The one stage-0 leg the crawl loop still assumed away: container crawl
  // corpora arrive in WARC (ISO 28500 — the Common Crawl interchange
  // format), not as rows in a table. The Spark side CONSTRUCTS a
  // deterministic 3-record WARC blob per doc (warcinfo → request →
  // response, the standard Common Crawl triplet) and WALKS it back by the
  // format's own framing — version line, named headers, Content-Length
  // body framing, CRLF CRLF terminators — a pure offset discipline (the
  // functions/MediaMeta.scala byte-walk pattern at the text-container
  // modality; reference semantics: the R1 one-container catalog scan,
  // /root/reference/src/CSVProvider.cs:641-656). The oracle re-derives
  // every output field from doc_id arithmetic + the shared constructions
  // and NEVER parses the blob — the hash gate verifies the walker itself.

  private val Crlf = "\r\n"
  /** Record separator: the blank line ending a WARC header block, and the
    * two CRLFs terminating each record's block. */
  private val CrlfCrlf = Crlf + Crlf

  /** One WARC record: header lines, the Content-Length header computed
    * from the body, the blank line, the body, the record terminator. The
    * corpus is printable ASCII end to end (pinned in WarcWalkSpec), so
    * character offsets ARE byte offsets; a production walk runs the same
    * arithmetic over binary. */
  private def warcRec(hdr: Column, body: Column): Column =
    concat(hdr, lit("Content-Length: "), length(body).cast("string"),
      lit(CrlfCrlf), body, lit(CrlfCrlf))

  /** The per-doc HTTP response block (record 3's body): status line varies
    * per doc (301 arm exercises non-200 extraction), then the c11 page as
    * payload behind the HTTP header/payload CRLF CRLF split. */
  private def c16Block3(html: Column): Column =
    concat(lit("HTTP/1.1 "),
      when(col("doc_id") % 13 === 0, lit("301 Moved Permanently"))
        .otherwise(lit("200 OK")),
      lit(Crlf + "Content-Type: text/html" + Crlf + "Server: graft/"),
      (col("doc_id") % 7).cast("string"), lit(CrlfCrlf), html)

  /** c16Block3 as DuckDB SQL over an `html` expression — the oracle's
    * content_length is the length of the CONSTRUCTED block, never a
    * parsed header. */
  private def c16Block3Sql(html: String): String =
    "'HTTP/1.1 ' || " +
      "CASE WHEN doc_id % 13 = 0 THEN '301 Moved Permanently' " +
      "ELSE '200 OK' END || chr(13) || chr(10) || " +
      "'Content-Type: text/html' || chr(13) || chr(10) || " +
      "'Server: graft/' || CAST(doc_id % 7 AS VARCHAR) || " +
      s"chr(13) || chr(10) || chr(13) || chr(10) || $html"

  // line-anchored like every other header pattern (r20 review): an
  // embedded '...Content-Length: N' inside another header's value would
  // otherwise win leftmost and silently mis-frame the walk
  private val WarcCLenP = "(?m)^Content-Length: ([0-9]+)"
  private val WarcTypeP = "(?m)^WARC-Type: (\\S+)"
  private[graft] val WarcUriP = "(?m)^WARC-Target-URI: (\\S+)"

  /** c16: WARC record ingest — construct each doc's 3-record WARC blob,
    * then walk it back record by record: find the header block's blank
    * line, read ITS Content-Length, skip that many characters plus the
    * record terminator to the next record — the walk never searches the
    * blob globally (bodies legally CONTAIN blank lines: the request
    * body's HTTP terminator, the response's header/payload split — a
    * split-on-blank-line shortcut mis-frames both; only the
    * Content-Length arithmetic is correct framing, which is the point of
    * the format). From the response record: the WARC-Type evidence trail
    * of all three records (any offset slip breaks it), the target URI,
    * the HTTP status, the block length, and the payload fed through c11's
    * markup chain.
    *
    * Scale shape: a pure per-row projection chain — construct once, walk
    * with substr/instr/regexp on header-sized fragments, zero shuffles to
    * the presentation sort; each intermediate (blob, record tails, header
    * blocks) is non-cheap multi-reference, so CollapseProject keeps it
    * evaluated once per row (c11's plan argument). At 100 TB the blob
    * column is the parquet-landed raw fetch this walk runs over
    * shard-parallel; nothing corpus-sized moves.
    */
  /** The shared warcinfo + request PREFIX of every constructed blob,
    * parameterized by its third record — ONE definition so c16's, d99's
    * and c18's corpora cannot drift (r20 review; the hostKey rationale
    * at the blob layer). */
  private def warcBlobWith(uri: Column, rec3: Column): Column = {
    val host = concat(lit("site-"), (col("doc_id") % 37).cast("string"),
      lit(".example"))
    val body1 = concat(lit("software: graft/1.0" + Crlf + "hostname: "),
      host, lit(Crlf))
    val body2 = concat(lit("GET /articles/"),
      (col("doc_id") % 100).cast("string"),
      lit(" HTTP/1.1" + Crlf + "Host: "), host,
      lit(Crlf + "User-Agent: graft" + CrlfCrlf))
    concat(
      warcRec(lit("WARC/1.0" + Crlf + "WARC-Type: warcinfo" + Crlf), body1),
      warcRec(concat(
        lit("WARC/1.0" + Crlf + "WARC-Type: request" + Crlf +
          "WARC-Target-URI: "), uri, lit(Crlf)), body2),
      rec3)
  }

  /** The constructed 3-record blob over any (uri, html) pair — c16 feeds
    * the c13 URL + c11 page; d99's e2e compose feeds d92's collision
    * corpus so the downstream URL-dedup stage actually collapses. */
  private[graft] def c16BlobWith(uri: Column, html: Column): Column =
    warcBlobWith(uri,
      warcRec(concat(
        lit("WARC/1.0" + Crlf + "WARC-Type: response" + Crlf +
          "WARC-Target-URI: "), uri, lit(Crlf)), c16Block3(html)))

  /** The constructed 3-record blob — package-private so WarcWalkSpec can
    * collect it and re-walk the framing in plain JVM code (exhaustion is
    * the invariant the hash gate cannot see: the oracle never parses). */
  private[queries] def c16Blob: Column = c16BlobWith(c13Url, c11Html)

  /** The framing walk over a frame carrying a `warc` column: appends the
    * three header blocks, the response block, and its HTTP payload — the
    * SHARED body of c16's declared extraction and d99's e2e compose (one
    * definition, so the composed pipeline can never drift from the
    * declared walker). */
  private[graft] def warcWalk(df: DataFrame): DataFrame = {
    // REFUSAL discipline (the decoder rule — junk NULLs, never throws;
    // r20 review follow-up, the StreamFetchPlan ANSI-cast class): a
    // header block missing its terminator refuses via the h > 0 guard
    // (instr = 0 otherwise walks garbage); a header missing
    // Content-Length extracts '' — which an ANSI cast THROWS on — and a
    // ≥ 16-digit length would overflow the cast the same way, so the
    // digit run is length-gated before casting (NULL otherwise, and the
    // NULL propagates through every downstream substr/instr to a NULL
    // payload — the refusal, reachable only on non-constructed input)
    def hdrOf(rec: Column, hEnd: Column): Column =
      when(hEnd > 0L, rec.substr(lit(1), hEnd - 1))
    def cLen(hdr: Column): Column = {
      val d = regexp_extract(hdr, WarcCLenP, 1)
      when(length(d).between(1, 15), d.cast("long"))
    }
    df
      // record 1: header ends at the first blank line of the BLOB
      .withColumn("h1", instr(col("warc"), CrlfCrlf).cast("long"))
      .withColumn("hdr1", hdrOf(col("warc"), col("h1")))
      // next record = blank line (4) + Content-Length body + terminator (4)
      .withColumn("rest2",
        col("warc").substr(col("h1") + cLen(col("hdr1")) + 8L,
          length(col("warc")).cast("long")))
      .withColumn("h2", instr(col("rest2"), CrlfCrlf).cast("long"))
      .withColumn("hdr2", hdrOf(col("rest2"), col("h2")))
      .withColumn("rest3",
        col("rest2").substr(col("h2") + cLen(col("hdr2")) + 8L,
          length(col("rest2")).cast("long")))
      .withColumn("h3", instr(col("rest3"), CrlfCrlf).cast("long"))
      .withColumn("hdr3", hdrOf(col("rest3"), col("h3")))
      .withColumn("len3", cLen(col("hdr3")))
      .withColumn("block3", col("rest3").substr(col("h3") + 4L, col("len3")))
      // HTTP split: the block's FIRST blank line (its own framing; the
      // he > 0 guard refuses a block with no header/payload split)
      .withColumn("he", instr(col("block3"), CrlfCrlf).cast("long"))
      .withColumn("payload", when(col("he") > 0L,
        col("block3").substr(col("he") + 4L, col("len3"))))
  }

  def c16WarcExtract(spark: SparkSession, sfDir: String): DataFrame = {
    warcWalk(Tables(spark, sfDir, "documents")
        .select(col("doc_id"), c16Blob.as("warc")))
      .select(col("doc_id"),
        concat_ws(",",
          regexp_extract(col("hdr1"), WarcTypeP, 1),
          regexp_extract(col("hdr2"), WarcTypeP, 1),
          regexp_extract(col("hdr3"), WarcTypeP, 1)).as("rec_types"),
        regexp_extract(col("hdr3"), WarcUriP, 1).as("target_uri"),
        regexp_extract(col("block3"), "^HTTP/1[.]1 ([0-9]+)", 1)
          .cast("long").as("http_status"),
        col("len3").as("content_length"),
        regexp_extract(col("payload"), "<title>(.*?)</title>", 1)
          .as("title"),
        markupClean(col("payload")).as("clean_text"))
      .withColumn("n_chars_clean", length(col("clean_text")).cast("long"))
      .orderBy("doc_id")
  }

  // --- c18: WARC revisit resolution (round 20) ----------------------------
  // The dedup semantics INSIDE the interchange format: a real crawl writes
  // a `revisit` record (ISO 28500 §6.7.2 — WARC-Refers-To + payload
  // digest, EMPTY body) instead of re-storing an identical payload, and a
  // pipeline reading the crawl must RESOLVE revisits to their referent
  // captures. The constructed corpus makes every doc ≡ 2 (mod 3) a
  // revisit of its predecessor; the walk classifies the record, extracts
  // the referent id + digest, and the resolution join recovers each
  // revisit's effective payload from its referent response.

  private[queries] val WarcRefersToP =
    "(?m)^WARC-Refers-To: urn:graft:([0-9]+)"
  private val WarcDigestP = "(?m)^WARC-Payload-Digest: (\\S+)"

  /** Deterministic response-payload length: 10 + doc_id % 90 — shared
    * with the oracle arithmetically. */
  private def c18PlenSql(id: String) = s"10 + ($id) % 90"

  /** c18's 3-record blob: c16's warcinfo + request framing, then EITHER
    * a response (HTTP block over a repeat-x payload of deterministic
    * length) OR a revisit — WARC-Refers-To naming the predecessor,
    * the digest carrying its referent's length, and a ZERO-LENGTH body
    * (the spec's shape for identical-payload-digest revisits; the walk's
    * he > 0 refusal arm correctly yields a NULL payload for them). */
  private[queries] def c18Blob: Column = {
    val uri = c13Url
    val plen = lit(10L) + col("doc_id") % 90L
    val refPlen = lit(10L) + (col("doc_id") - 1L) % 90L
    warcBlobWith(uri, when(col("doc_id") % 3 === 2,
      warcRec(concat(
        lit("WARC/1.0" + Crlf + "WARC-Type: revisit" + Crlf +
          "WARC-Target-URI: "), uri,
        lit(Crlf + "WARC-Profile: identical-payload-digest" + Crlf +
          "WARC-Refers-To: urn:graft:"),
        (col("doc_id") - 1L).cast("string"),
        lit(Crlf + "WARC-Payload-Digest: len:"),
        refPlen.cast("string"), lit(Crlf)), lit("")))
      .otherwise(
        warcRec(concat(
          lit("WARC/1.0" + Crlf + "WARC-Type: response" + Crlf +
            "WARC-Target-URI: "), uri, lit(Crlf)),
          concat(lit("HTTP/1.1 200 OK" + Crlf +
            "Content-Type: text/plain" + CrlfCrlf),
            repeat(lit("x"), plen.cast("int"))))))
  }

  /** c18: WARC revisit resolution — construct, walk (the SHARED
    * [[warcWalk]]), classify record 3, extract the referent id + digest
    * from revisits, and resolve each revisit's effective payload length
    * from its referent response via the resolution join.
    *
    * Scale shape: construct + walk scan-side (c16's argument); the
    * resolution join shuffles only (id, len) rows on the referent key —
    * the join a deduplicating crawl STORE runs to materialize its
    * corpus, linear in records. The zero-length revisit body exercises
    * the walk's empty-block arm (payload NULL by the he guard — which is
    * semantically the right answer: revisits HAVE no payload).
    */
  def c18WarcRevisit(spark: SparkSession, sfDir: String): DataFrame = {
    // lazy localCheckpoint barrier, the d99 lesson (SCALE.md rule): the
    // rec_type filter below would otherwise push down through the
    // walk's multi-reference levels and grow exponentially by alias
    // substitution (measured 33 s → sub-second at sf0.1), and the
    // resolution join would re-derive the walk on its build side
    val walked = warcWalk(Tables(spark, sfDir, "documents")
        .select(col("doc_id"), c18Blob.as("warc")))
      .select(col("doc_id"),
        regexp_extract(col("hdr3"), WarcTypeP, 1).as("rec_type"),
        regexp_extract(col("hdr3"), WarcUriP, 1).as("target_uri"),
        nullif(regexp_extract(col("hdr3"), WarcRefersToP, 1), lit(""))
          .cast("long").as("referent_id"),
        nullif(regexp_extract(col("hdr3"), WarcDigestP, 1), lit(""))
          .as("payload_digest"),
        when(col("payload").isNotNull,
          length(col("payload")).cast("long")).as("own_len"))
      .localCheckpoint(false)
    val responses = walked.filter(col("rec_type") === "response")
      .select(col("doc_id").as("referent_id"), col("own_len").as("ref_len"))
    // only the REVISIT rows enter the resolution join (r20 review): a
    // whole-frame left join would ship every response row with a NULL
    // key — and NULL keys hash to ONE partition, a single-task
    // straggler holding 2/3 of the corpus at scale; the split-and-union
    // keeps the join revisit-sized and the claim "only (id, len) rows
    // shuffle" true
    val resolved = walked.filter(col("referent_id").isNotNull)
      .join(responses, Seq("referent_id"), "left")
      .select(col("doc_id"), col("rec_type"), col("target_uri"),
        col("referent_id"), col("payload_digest"),
        coalesce(col("own_len"), col("ref_len"))
          .as("effective_payload_len"))
    walked.filter(col("referent_id").isNull)
      .select(col("doc_id"), col("rec_type"), col("target_uri"),
        col("referent_id"), col("payload_digest"),
        col("own_len").as("effective_payload_len"))
      .unionByName(resolved)
      .orderBy("doc_id")
  }

  // --- c17: sitemap discovery (round 20) ----------------------------------
  // The third politeness-adjacent crawl input next to robots.txt (c15/d97)
  // and outlinks (c14/d95): the `Sitemap:` directive of the robots
  // extension (sitemaps.org protocol, referenced by RFC 9309 §2.3's
  // "other records") names a urlset document whose <loc> entries are a
  // crawler's SECOND frontier source. Host-grouped from the start — a
  // sitemap is a per-HOST artifact, so everything here runs on the
  // domains-sized frame (the d97 discipline; never once per doc).

  /** `Sitemap:` line extraction — line-anchored like [[RobotsDisP]]
    * (without `(?m)^` the pattern would also match inside a path that
    * happens to contain the token). */
  private[queries] val SitemapP = "(?m)^Sitemap: (\\S+)"

  /** urlset `<loc>` extraction — `[^<]*` (not a lazy dot) so the pattern
    * is structurally bounded by the closing tag under both engines. */
  private val LocP = "<loc>([^<]*)</loc>"

  /** c17's per-HOST urlset, constructed from the domain string, its
    * embedded numeric key k (d97's host key), and the host's
    * representative corpus page `known_url` (min canonical URL per
    * domain — the d95 census representative): four `<loc>` entries, one
    * per discovery arm — (1) a NEW page in canonical surface form,
    * (2) the SAME page in noisy surface form (scheme/host case, `www.`,
    * the https-default `:443`, `/index.html` — must collapse under
    * c13's kernel), (3) the host's own representative corpus page (the
    * known arm — the frontier diff must drop it, d95's self-link
    * discipline), (4) a second new page. Spark-side only — the oracle
    * re-derives every census figure from the same constructions and
    * never parses XML. */
  private def c17Urlset(domain: Column, k: Column, knownUrl: Column): Column =
    concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"),
      lit("<url><loc>https://"), domain, lit("/sitemap-page/"),
      k.cast("string"), lit("/</loc></url>\n"),
      lit("<url><loc>HTTPS://WWW."), upper(domain),
      lit(":443/sitemap-page/"), k.cast("string"),
      lit("/index.html</loc></url>\n"),
      lit("<url><loc>"), knownUrl, lit("</loc></url>\n"),
      lit("<url><loc>https://"), domain, lit("/sitemap-extra/"),
      (k % 10).cast("string"), lit("</loc></url>\n</urlset>\n"))

  /** c17: sitemap discovery — per registered domain of the corpus's own
    * URLs: construct the host's robots.txt carrying its `Sitemap:` line,
    * extract the sitemap URL (line-anchored), construct the urlset that
    * sitemap would return, extract its `<loc>` entries, canonicalize
    * each through [[urlNormalize]], and diff against the corpus's
    * canonical URLs — the per-domain census of sitemap-DISCOVERED new
    * pages (n_locs → n_canon proves surface collapse; n_new < n_canon
    * proves the known arm drops).
    *
    * Scale shape: host-grouped end to end — the robots/urlset
    * construction, both extractions, and the canonicalization run on the
    * DOMAINS-sized frame (one partial-agg groupBy over the corpus
    * projection builds it), never once per doc (c15's per-doc caveat
    * does not apply here by construction); the explode ships 4 canonical
    * strings per HOST; the known-diff anti-join shuffles on d92's
    * canonical-URL key with the corpus side streaming once (d95's
    * shape); the final census join is domains-sized-to-domains-sized
    * with the post-agg side broadcast. At 100 TB nothing corpus-sized
    * moves except the one corpus scan each side of the groupBy/anti-join
    * pays.
    */
  /** The corpus's canonical-URL frame on its registered-domain key —
    * c17's known set and host source. */
  private def c17Corpus(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), c13Url.as("url"))
      .select(urlNormalize(col("url")).as("norm_url"),
        urlDomain(col("url")).as("domain"))
      .filter(col("domain").isNotNull)

  /** The DOMAINS-sized host frame with its constructed robots, extracted
    * sitemap URL, constructed urlset, and extracted locs. */
  private def c17Hosts(spark: SparkSession, sfDir: String): DataFrame =
    c17Corpus(spark, sfDir).groupBy("domain")
      .agg(min(col("norm_url")).as("known_url"))
      .withColumn("k", hostKey(col("domain")))
      .withColumn("robots", concat(
        lit("User-agent: *\nDisallow: /private\nSitemap: http://"),
        col("domain"), lit("/sitemap.xml\n")))
      .withColumn("sitemap_url", regexp_extract(col("robots"), SitemapP, 1))
      // urlset is non-cheap multi-reference: CollapseProject keeps the
      // construction evaluated once per HOST row (c11's plan argument)
      .withColumn("urlset",
        c17Urlset(col("domain"), col("k"), col("known_url")))
      .withColumn("locs", regexp_extract_all(col("urlset"), lit(LocP),
        lit(1)))

  /** The sitemap-DISCOVERED frame (domain, norm_url): locs walked,
    * canonicalized, deduped, anti-joined against the corpus's canonical
    * URLs — the frontier contribution d98 unions with d95's outlink
    * source. StageCache-persisted per corpus (d95Frontier's policy) so
    * the declared census and the union compose share ONE
    * materialization. */
  private[queries] def c17Fresh(spark: SparkSession,
                                sfDir: String): DataFrame =
    graft.operators.StageCache.persisted(s"$sfDir#c17_fresh") {
      c17Hosts(spark, sfDir)
        .select(col("domain"), explode(col("locs")).as("loc"))
        .select(col("domain"), urlNormalize(col("loc")).as("norm_url"))
        .filter(col("norm_url").isNotNull)
        .distinct()
        .join(c17Corpus(spark, sfDir).select("norm_url"),
          Seq("norm_url"), "left_anti")
    }

  def c17SitemapDiscover(spark: SparkSession, sfDir: String): DataFrame = {
    val fresh = c17Fresh(spark, sfDir)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_new"), min(col("norm_url")).as("first_new"))
    c17Hosts(spark, sfDir).select(col("domain"), col("sitemap_url"),
        size(col("locs")).cast("long").as("n_locs"),
        size(array_distinct(transform(col("locs"), l => urlNormalize(l))))
          .cast("long").as("n_canon"))
      .join(broadcast(fresh), Seq("domain"))
      .orderBy("domain")
  }

  /** The sitemap-news oracle CTE chain, `prefix`-namespaced (the
    * frontierOracleCtes discipline — d98 nests it NEXT TO the outlink
    * chain, whose relation names the unprefixed c13 chain already
    * takes), ending at `<prefix>sm(domain, norm_url)`: the two
    * constructed NEW canonicals per registered domain, re-derived
    * arithmetically — never parsed from robots or XML. The known arm is
    * absent by construction (it is a corpus URL; the diff drops it). */
  private[queries] def c17NewCtes(prefix: String): String =
    s"""${c13NormCtes("", prefix = prefix)},
       |${prefix}d AS (SELECT domain FROM ${prefix}n
       |  WHERE domain IS NOT NULL GROUP BY domain),
       |${prefix}hk AS (SELECT domain,
       |  COALESCE(CAST(NULLIF(regexp_extract(domain, '([0-9]+)', 1), '')
       |    AS BIGINT), 0) % 37 AS k FROM ${prefix}d),
       |${prefix}sm AS (
       |  SELECT domain, 'https://' || domain || '/sitemap-page/' ||
       |    CAST(k AS VARCHAR) || '/' AS norm_url FROM ${prefix}hk
       |  UNION ALL
       |  SELECT domain, 'https://' || domain || '/sitemap-extra/' ||
       |    CAST(k % 10 AS VARCHAR) AS norm_url FROM ${prefix}hk)"""
      .stripMargin

  val queries: Map[String, Q] = Map(
    "c11_markup_extract" -> (c11MarkupExtract _),
    "c12_markup_gopher"  -> (c12MarkupGopher _),
    "c13_url_normalize"  -> (c13UrlNormalize _),
    "c14_outlink_harvest" -> (c14OutlinkHarvest _),
    "c15_robots_gate"    -> (c15RobotsGate _),
    "c16_warc_extract"   -> (c16WarcExtract _),
    "c17_sitemap_discover" -> (c17SitemapDiscover _),
    "c18_warc_revisit"   -> (c18WarcRevisit _),
    "c9_media_card"      -> (c9MediaCard _),
    "c1_dedup_exact"     -> (c1DedupExact _),
    "c6_pii_redact"      -> (c6PiiRedact _),
    "c7_containment"     -> (c7Containment _),
    "c2_dedup_near"      -> (c2DedupNear _),
    "c3_similarity_topk" -> (c3SimilarityTopk _),
    "c4_text_analysis"   -> (c4TextAnalysis _),
    "c5_multimodal_cols" -> (c5MultimodalCols _),
    "c8_media_meta"      -> (c8MediaMeta _),
  )

  private val tokSql = tokenizeSql("text")

  /** c8's oracle, shared with c9's aggregation (the d78/d80 nesting
    * pattern at the media modality). */
  private val c8OracleSql: String =
      """SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 0 THEN 'wav'
        |       WHEN doc_id % 13 = 2 THEN 'opus'
        |       WHEN doc_id % 13 = 3 THEN 'mp4'
        |       WHEN doc_id % 13 = 4 THEN 'webm'
        |       WHEN doc_id % 13 = 6 THEN 'flac'
        |       WHEN doc_id % 13 = 7 THEN 'mp3' END AS media_format,
        |  CASE WHEN doc_id % 13 = 0
        |    THEN CAST(8000 * (1 + doc_id % 4) AS BIGINT)
        |       WHEN doc_id % 13 = 2
        |    THEN CAST(12000 * (1 + doc_id % 4) AS BIGINT)
        |       WHEN doc_id % 13 = 4
        |    THEN CAST(8000 * (1 + doc_id % 4) AS BIGINT)
        |       WHEN doc_id % 13 = 6
        |    THEN CAST(16000 * (1 + doc_id % 3) AS BIGINT)
        |       WHEN doc_id % 13 = 7
        |    THEN CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |              ELSE 32000 END AS BIGINT)
        |  END AS audio_sample_rate_hz,
        |  CASE WHEN doc_id % 13 IN (0, 2, 4, 6)
        |    THEN CAST(1 + doc_id % 2 AS BIGINT)
        |       WHEN doc_id % 13 = 7
        |    THEN CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
        |  END AS audio_channels,
        |  CASE WHEN doc_id % 13 = 0 THEN CAST(16 AS BIGINT)
        |       WHEN doc_id % 13 = 6
        |    THEN CAST(16 + 8 * (doc_id % 2) AS BIGINT) END AS audio_bits,
        |  CASE WHEN doc_id % 13 = 0
        |    THEN CAST((1 + doc_id % 5) * 1000 AS BIGINT)
        |       WHEN doc_id % 13 = 2
        |    THEN CAST((1 + doc_id % 5) * 1000 AS BIGINT)
        |       WHEN doc_id % 13 = 3
        |    THEN CAST((2 + doc_id % 6) * 1000 AS BIGINT)
        |       WHEN doc_id % 13 = 4
        |    THEN CAST(1 AS BIGINT) << CAST(10 + doc_id % 6 AS INTEGER)
        |       WHEN doc_id % 13 = 6
        |    THEN CAST((1 + doc_id % 5) * 1000 AS BIGINT)
        |       WHEN doc_id % 13 = 7
        |    THEN CAST(100 * (1 + doc_id % 4) * 1152 * 1000
        |      // (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |          ELSE 32000 END) AS BIGINT)
        |  END AS media_duration_ms,
        |  CASE WHEN doc_id % 13 = 4
        |    THEN CAST(100 + doc_id % 1000 AS BIGINT) END AS media_video_width,
        |  CASE WHEN doc_id % 13 = 4
        |    THEN CAST(100 + (doc_id * 3) % 1000 AS BIGINT) END AS media_video_height,
        |  CASE WHEN doc_id % 13 = 1 THEN 'png'
        |       WHEN doc_id % 13 = 5 THEN 'webp'
        |       WHEN doc_id % 13 = 8 THEN 'jpeg'
        |       WHEN doc_id % 13 = 9 THEN 'bmp'
        |       WHEN doc_id % 13 = 10 THEN 'gif' END AS img_format,
        |  CASE WHEN doc_id % 13 = 1
        |    THEN CAST(16 + doc_id % 100 AS BIGINT)
        |       WHEN doc_id % 13 = 5
        |    THEN CAST(100 + doc_id % 500 AS BIGINT)
        |       WHEN doc_id % 13 = 8
        |    THEN CAST(16 + doc_id % 200 AS BIGINT)
        |       WHEN doc_id % 13 = 9
        |    THEN CAST(9 + doc_id % 300 AS BIGINT)
        |       WHEN doc_id % 13 = 10
        |    THEN CAST(10 + doc_id % 400 AS BIGINT) END AS img_width,
        |  CASE WHEN doc_id % 13 = 1
        |    THEN CAST(16 + (doc_id * 7) % 100 AS BIGINT)
        |       WHEN doc_id % 13 = 5
        |    THEN CAST(100 + (doc_id * 11) % 500 AS BIGINT)
        |       WHEN doc_id % 13 = 8
        |    THEN CAST(16 + (doc_id * 13) % 200 AS BIGINT)
        |       WHEN doc_id % 13 = 9
        |    THEN CAST(8 + (doc_id * 17) % 300 AS BIGINT)
        |       WHEN doc_id % 13 = 10
        |    THEN CAST(10 + (doc_id * 19) % 400 AS BIGINT) END AS img_height,
        |  CASE WHEN doc_id % 13 = 8
        |    THEN CAST(1 + doc_id % 8 AS BIGINT) END AS img_orientation
        |FROM documents ORDER BY doc_id""".stripMargin

  /** d69's DuckDB oracle body, parameterized by extra leading CTEs and
    * the (doc_id, text) source relation — shared by d69
    * (source = documents) and c12 (source = the markup-cleaned CTE), so
    * the composed gate's oracle is literally the declared d69's. It
    * lives HERE, not next to d69 in GroupD, because GroupD's object
    * initialization reads GroupC vals — a GroupC-init reference back
    * into GroupD would deadlock/NPE the object-init cycle.
    */
  private[queries] def gopherOracleSql(ctes: String, source: String): String =
    s"""WITH ${ctes}base AS (
       |  SELECT doc_id, text,
       |    list_filter(${tokenizeSql("text")}, t -> t <> '') AS ts
       |  FROM $source),
       |m AS (
       |  SELECT doc_id,
       |    len(ts)::BIGINT AS n_words,
       |    COALESCE(list_sum(list_transform(ts, t -> len(t))), 0)::BIGINT
       |      AS sum_len,
       |    len(list_filter(ts, t -> regexp_matches(t, '[a-z]')))::BIGINT
       |      AS n_alpha,
       |    (list_contains(ts, 'the')::BIGINT + list_contains(ts, 'be')::BIGINT
       |     + list_contains(ts, 'to')::BIGINT + list_contains(ts, 'of')::BIGINT
       |     + list_contains(ts, 'and')::BIGINT
       |     + list_contains(ts, 'that')::BIGINT
       |     + list_contains(ts, 'have')::BIGINT
       |     + list_contains(ts, 'with')::BIGINT) AS stop_hits,
       |    len(regexp_extract_all(text, '#|\\.\\.\\.'))::BIGINT AS n_symbols
       |  FROM base)
       |SELECT doc_id, n_words,
       |  sum_len * 100 // greatest(n_words, 1) AS mean_word_len_fp,
       |  n_alpha * 10000 // greatest(n_words, 1) AS alpha_frac_fp,
       |  stop_hits,
       |  n_symbols * 10000 // greatest(n_words, 1) AS symbol_frac_fp,
       |  (n_words BETWEEN 50 AND 100000) AS r_word_count,
       |  (sum_len * 100 // greatest(n_words, 1) BETWEEN 300 AND 1000)
       |    AS r_mean_len,
       |  (n_alpha * 10000 // greatest(n_words, 1) >= 8000) AS r_alpha,
       |  (stop_hits >= 1) AS r_stop,
       |  (n_symbols * 10000 // greatest(n_words, 1) < 1000) AS r_symbol,
       |  ((n_words BETWEEN 50 AND 100000)
       |   AND (sum_len * 100 // greatest(n_words, 1) BETWEEN 300 AND 1000)
       |   AND (n_alpha * 10000 // greatest(n_words, 1) >= 8000)
       |   AND (stop_hits >= 1)
       |   AND (n_symbols * 10000 // greatest(n_words, 1) < 1000)) AS keep
       |FROM m
       |ORDER BY doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "c11_markup_extract" ->
      s"""WITH h AS (SELECT doc_id, $c11HtmlSql AS html FROM documents),
         |c AS (SELECT doc_id,
         |  regexp_extract(html, '<title>(.*?)</title>', 1) AS title,
         |  ${markupCleanSql("html")} AS clean_text FROM h)
         |SELECT doc_id, title, clean_text,
         |  CAST(length(clean_text) AS BIGINT) AS n_chars_clean
         |FROM c ORDER BY doc_id""".stripMargin,
    "c13_url_normalize" ->
      s"""WITH ${c13NormCtes("")}
         |SELECT doc_id, url, norm_url, domain FROM n
         |ORDER BY doc_id""".stripMargin,
    // c14: the page construction + href explode feed the SAME
    // normalization CTE chain c13/d91/d92 compile (from = the exploded
    // link relation). COUNT(DISTINCT)/MIN skip the refused arm's NULLs —
    // the Spark side filters them before distinct/min, same contract.
    // The final select LEFT-joins back to documents (r19 review): a doc
    // with ZERO hrefs keeps its (0, 0, NULL) row on the Spark side
    // (size of an empty extract array is 0), so the oracle must not
    // drop it out of the GROUP BY — unreachable on the constructed
    // corpus (every page carries 5 anchors), pinned because the chain
    // is a reusable surface.
    "c14_outlink_harvest" ->
      s"""WITH h AS (SELECT doc_id, ${partsHtmlSql(c14Parts)} AS html
         |  FROM documents),
         |l AS (SELECT doc_id,
         |  unnest(regexp_extract_all(html, '$HrefP', 1)) AS url FROM h),
         |${c13NormCtes("", "url", "l")},
         |agg AS (SELECT doc_id, COUNT(*)::BIGINT AS n_links,
         |  COUNT(DISTINCT norm_url)::BIGINT AS n_canon,
         |  MIN(norm_url) AS min_target
         |FROM n GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(a.n_links, 0) AS n_links,
         |  COALESCE(a.n_canon, 0) AS n_canon, a.min_target
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // c16: the oracle NEVER walks the WARC blob — it re-derives every
    // output field from doc_id arithmetic + the shared constructions
    // (rec_types is the literal the walk must evidence; content_length
    // is the length of the CONSTRUCTED response block; target_uri is the
    // shared c13 construction; title/clean ride c11's shared chain), so
    // the hash gate verifies the Spark side's framing walker itself.
    "c16_warc_extract" ->
      s"""WITH h AS (SELECT doc_id, $c11HtmlSql AS html FROM documents),
         |b AS (SELECT doc_id, html,
         |  ${c16Block3Sql("html")} AS block3,
         |  ${markupCleanSql("html")} AS clean_text FROM h)
         |SELECT doc_id,
         |  'warcinfo,request,response' AS rec_types,
         |  (${c13UrlSql(e => s"CAST($e AS VARCHAR)")}) AS target_uri,
         |  (CASE WHEN doc_id % 13 = 0 THEN 301 ELSE 200 END)::BIGINT
         |    AS http_status,
         |  length(block3)::BIGINT AS content_length,
         |  regexp_extract(html, '<title>(.*?)</title>', 1) AS title,
         |  clean_text,
         |  CAST(length(clean_text) AS BIGINT) AS n_chars_clean
         |FROM b ORDER BY doc_id""".stripMargin,
    // c18: the oracle NEVER walks the blob — rec_type, referent, digest
    // and the RESOLVED payload length all re-derive from doc_id
    // arithmetic (the hash gate therefore verifies the walk's record
    // classification, the revisit-header extractions, the zero-length-
    // body refusal arm AND the resolution join end to end).
    "c18_warc_revisit" ->
      s"""SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 2 THEN 'revisit'
         |       ELSE 'response' END AS rec_type,
         |  (${c13UrlSql(e => s"CAST($e AS VARCHAR)")}) AS target_uri,
         |  (CASE WHEN doc_id % 3 = 2 THEN doc_id - 1 END)::BIGINT
         |    AS referent_id,
         |  CASE WHEN doc_id % 3 = 2
         |    THEN 'len:' || CAST(${c18PlenSql("doc_id - 1")} AS VARCHAR)
         |  END AS payload_digest,
         |  (CASE WHEN doc_id % 3 = 2 THEN ${c18PlenSql("doc_id - 1")}
         |        ELSE ${c18PlenSql("doc_id")} END)::BIGINT
         |    AS effective_payload_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    // c17: the oracle NEVER parses robots.txt or XML — it re-derives the
    // whole census arithmetically from the shared constructions: the
    // domain frame and its representative page come from the c13 CTE
    // chain; the sitemap URL is the constructed literal; the loc count is
    // the construction's 4; the canonical count is 3 (the surface pair
    // collapses by construction); the new count is 2 (the known arm IS a
    // corpus canonical by construction, so the diff drops exactly it);
    // first_new is the smaller of the two constructed new canonicals.
    // The hash gate therefore verifies the Spark side's Sitemap-line
    // extraction, <loc> walk, canonicalization, and diff end to end.
    "c17_sitemap_discover" ->
      s"""WITH ${c13NormCtes("")},
         |d AS (SELECT domain, min(norm_url) AS known_url FROM n
         |  WHERE domain IS NOT NULL GROUP BY domain),
         |h AS (SELECT domain,
         |  COALESCE(CAST(NULLIF(regexp_extract(domain, '([0-9]+)', 1), '')
         |    AS BIGINT), 0) % 37 AS k
         |  FROM d)
         |SELECT domain,
         |  'http://' || domain || '/sitemap.xml' AS sitemap_url,
         |  4::BIGINT AS n_locs,
         |  3::BIGINT AS n_canon,
         |  2::BIGINT AS n_new,
         |  LEAST(
         |    'https://' || domain || '/sitemap-page/' ||
         |      CAST(k AS VARCHAR) || '/',
         |    'https://' || domain || '/sitemap-extra/' ||
         |      CAST(k % 10 AS VARCHAR)) AS first_new
         |FROM h ORDER BY domain""".stripMargin,
    // c15: the oracle NEVER parses robots.txt — it re-derives every rule
    // and decision arithmetically from doc_id (the constructed-bytes
    // discipline), so the hash gate verifies the Spark side's PARSER
    // (line-anchored extraction + longest-match fold).
    "c15_robots_gate" ->
      """WITH b AS (SELECT doc_id,
        |  '/articles/' || CAST(doc_id % 100 AS VARCHAR) AS path,
        |  CAST((doc_id % 37) % 10 AS VARCHAR) AS k,
        |  CAST((doc_id % 37) % 3 AS VARCHAR) AS m,
        |  (doc_id % 37) % 4 = 0 AS blanket,
        |  CAST(1 + (doc_id % 37) % 9 AS BIGINT) AS crawl_delay_s
        |  FROM documents),
        |r AS (SELECT doc_id, path, crawl_delay_s,
        |  GREATEST(
        |    CASE WHEN blanket AND starts_with(path, '/articles/')
        |         THEN length('/articles/') ELSE 0 END,
        |    CASE WHEN starts_with(path, '/articles/' || k)
        |         THEN length('/articles/' || k) ELSE 0 END,
        |    CASE WHEN starts_with(path, '/private')
        |         THEN length('/private') ELSE 0 END)::BIGINT
        |    AS best_disallow,
        |  (CASE WHEN starts_with(path, '/articles/' || k || m)
        |        THEN length('/articles/' || k || m) ELSE 0 END)::BIGINT
        |    AS best_allow
        |  FROM b)
        |SELECT doc_id, path, best_disallow, best_allow,
        |  best_allow >= best_disallow AS allowed, crawl_delay_s
        |FROM r ORDER BY doc_id""".stripMargin,
    "c12_markup_gopher" -> gopherOracleSql(
      s"h AS (SELECT doc_id, $c11HtmlSql AS html FROM documents),\n" +
        s"cleaned AS (SELECT doc_id, ${markupCleanSql("html")} AS text " +
        "FROM h),\n",
      "cleaned"),
    "c9_media_card" ->
      s"""WITH m AS (
         |$c8OracleSql)
         |SELECT media_format, img_format,
         |  COUNT(*)::BIGINT AS n_assets,
         |  COUNT(audio_sample_rate_hz)::BIGINT AS n_audio,
         |  CAST(SUM(COALESCE(audio_sample_rate_hz, 0)) AS BIGINT)
         |    AS sum_rate_hz,
         |  CAST(SUM(COALESCE(media_duration_ms, 0)) AS BIGINT)
         |    AS sum_duration_ms,
         |  COUNT(img_width)::BIGINT AS n_img,
         |  CAST(SUM(COALESCE(img_width * img_height, 0)) AS BIGINT)
         |    AS sum_img_px
         |FROM m GROUP BY media_format, img_format
         |ORDER BY media_format NULLS FIRST, img_format NULLS FIRST"""
        .stripMargin,
    // c8's oracle never parses bytes: it re-derives every field from
    // doc_id by the same arithmetic the Spark side used to CONSTRUCT the
    // container bytes — so the hash compare verifies the byte walks
    "c8_media_meta" -> c8OracleSql,
    "c1_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "c2_dedup_near" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $tokSql AS ts FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
         |  FROM toks, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i)
         |  WHERE len(ts) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  ROUND(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 4) AS jaccard
         |FROM common
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    "c3_similarity_topk" ->
      """SELECT vec_id, label,
        |  ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS sim
        |FROM embeddings
        |ORDER BY sim DESC, vec_id
        |LIMIT 20""".stripMargin,
    "c4_text_analysis" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($tokSql) AS token FROM documents)
         |SELECT token, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS n_docs
         |FROM toks WHERE token <> ''
         |GROUP BY token
         |ORDER BY cnt DESC, token""".stripMargin,
    "c5_multimodal_cols" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "c7_containment" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $tokSql AS ts FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
         |  FROM toks, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i)
         |  WHERE len(ts) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  (c * 10000) // sa.n AS cont_a_fp,
         |  (c * 10000) // sb.n AS cont_b_fp
         |FROM common
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE c * 10 >= sa.n * 9 OR c * 10 >= sb.n * 9
         |ORDER BY doc_a, doc_b""".stripMargin,
    "c6_pii_redact" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(
         |    regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'), '$LongNumRe'))
         |    AS BIGINT) AS n_longnum,
         |  md5(regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
         |    '$LongNumRe', '<NUM>', 'g')) AS redacted_fp
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
  )
}
