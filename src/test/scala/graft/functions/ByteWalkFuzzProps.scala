package graft.functions

import org.scalacheck.{Arbitrary, Gen, Prop, Properties}
import org.scalacheck.Test.Parameters

/** Fuzz pins for every container-header byte walk: crawled bytes are an
  * adversarial surface, and the ONE contract all six scanners share is
  * "any byte array returns a value or null — never throws, never loops".
  * Three generators: pure random bytes, random bytes seeded with real
  * magics (forces the walks past their cheap magic rejection into the
  * offset arithmetic), and truncations/mutations of genuine headers
  * (forces every mid-structure bounds check).
  */
object ByteWalkFuzzProps extends Properties("byteWalks") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(300)

  private def scansSucceed(b: Array[Byte]): Prop = Prop.secure {
    JpegDims.scan(b)
    WebpDims.scan(b)
    JpegExifOrientation.scan(b)
    WavMeta.scan(b)
    Mp4Meta.scan(b)
    FlacMeta.scan(b)
    Mp3Meta.scan(b)
    OggOpusMeta.scan(b)
    MkvMeta.scan(b)
    BmpDhash.scan(b)
    BmpResize.scan(b, 4, 4)
    WavEnergyHash.scan(b)
    PngDhash.scan(b)
    GifDhash.scan(b)
    Y4mEnvelopeHash.scan(b)
    true
  }

  private def ascii(s: String) = s.getBytes("US-ASCII")
  private def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
    (v >> 8).toByte, v.toByte)

  private val magics: Seq[Array[Byte]] = Seq(
    Array[Byte](0xFF.toByte, 0xD8.toByte),              // JPEG SOI
    ascii("RIFF"), ascii("WAVE"), ascii("fLaC"), ascii("ID3"),
    ascii("ftyp"), ascii("moov"), ascii("mvhd"), ascii("Exif"),
    Array[Byte](0xFF.toByte, 0xFB.toByte),              // MP3 sync
    ascii("Xing"), ascii("OggS"), ascii("OpusHead"),
    Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte),  // EBML magic
    Array[Byte](0x18, 0x53, 0x80.toByte, 0x67),         // Segment
    ascii("WEBP"), ascii("VP8 "), ascii("VP8L"), ascii("VP8X"),
    ascii("BM"),
    Array[Byte](0x89.toByte) ++ ascii("PNG") :+ 0x0D.toByte :+ 0x0A.toByte,
    ascii("IHDR"), ascii("IDAT"), ascii("IEND"),
    ascii("GIF89a"), ascii("GIF87a"),
    ascii("YUV4MPEG2"), ascii("FRAME"))

  property("random bytes never throw in any scanner") =
    Prop.forAll(Gen.containerOf[Array, Byte](Arbitrary.arbitrary[Byte])) {
      b => scansSucceed(b)
    }

  property("random bytes spliced with real magics never throw") = {
    val gen = for {
      base <- Gen.containerOf[Array, Byte](Arbitrary.arbitrary[Byte])
      m <- Gen.oneOf(magics)
      at <- Gen.chooseNum(0, math.max(0, base.length - 1))
    } yield {
      val out = base.clone()
      var i = 0
      while (i < m.length && at + i < out.length) { out(at + i) = m(i); i += 1 }
      out
    }
    Prop.forAll(gen)(b => scansSucceed(b))
  }

  property("truncations and mutations of genuine headers never throw") = {
    // one genuine instance per format (the spec suites verify PARSE
    // correctness; here they are mutation seed stock)
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte,
      0x00, 0x10) ++ ascii("JFIF") ++ Array.fill[Byte](10)(0) ++
      Array[Byte](0xFF.toByte, 0xC0.toByte, 0x00, 0x11, 0x08, 0x01, 0xE0.toByte,
        0x02, 0x80.toByte) ++ Array.fill[Byte](10)(0)
    val wav = ascii("RIFF") ++ Array[Byte](36, 0, 0, 0) ++ ascii("WAVEfmt ") ++
      Array[Byte](16, 0, 0, 0, 1, 0, 2, 0, 0x44, 0xAC.toByte, 0, 0) ++
      Array.fill[Byte](8)(0) ++ ascii("data") ++ Array[Byte](16, 0, 0, 0)
    val mp4 = be32(16) ++ ascii("ftyp") ++ ascii("isomiso2") ++
      be32(108) ++ ascii("moov") ++ be32(100) ++ ascii("mvhd") ++
      Array[Byte](0, 0, 0, 0) ++ Array.fill[Byte](8)(0) ++ be32(600) ++
      be32(1200) ++ Array.fill[Byte](72)(0)
    val flac = ascii("fLaC") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++
      Array.fill[Byte](34)(0x11)
    val mp3 = Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x00) ++
      Array.fill[Byte](32)(0) ++ ascii("Xing") ++ be32(1) ++ be32(100)
    val opus = ascii("OggS") ++ Array[Byte](0, 2) ++ Array.fill[Byte](20)(0) ++
      Array[Byte](1, 19) ++ ascii("OpusHead") ++
      Array[Byte](1, 2, 0, 0, 0x44, 0xAC.toByte, 0, 0, 0, 0, 0) ++
      ascii("OggS") ++ Array[Byte](0, 4) ++
      Array[Byte](0x40, 0x38.toByte, 0, 0, 0, 0, 0, 0) ++
      Array.fill[Byte](12)(0) ++ Array[Byte](1, 1, 0x41)
    // minimal webm: EBML header w/ DocType, Segment w/ Info(timescale,
    // duration f32) + Tracks(audio entry) — exercises the VINT walk
    val mkv = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte, 0x87.toByte) ++
      Array[Byte](0x42, 0x82.toByte, 0x84.toByte) ++ ascii("webm") ++
      Array[Byte](0x18, 0x53, 0x80.toByte, 0x67, 0xA8.toByte) ++
      Array[Byte](0x15, 0x49, 0xA9.toByte, 0x66, 0x8E.toByte,
        0x2A, 0xD7.toByte, 0xB1.toByte, 0x83.toByte, 0x0F, 0x42, 0x40,
        0x44, 0x89.toByte, 0x84.toByte, 0x45, 0x7A, 0x00, 0x00) ++
      Array[Byte](0x16, 0x54, 0xAE.toByte, 0x6B, 0x90.toByte,
        0xAE.toByte, 0x8E.toByte, 0x83.toByte, 0x81.toByte, 0x02,
        0xE1.toByte, 0x89.toByte,
        0xB5.toByte, 0x84.toByte, 0x47, 0x3B, 0x80.toByte, 0x00,
        0x9F.toByte, 0x81.toByte, 0x02)
    val bmpSeed = {
      val bb = java.nio.ByteBuffer.allocate(278)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(278).putInt(0).putInt(54)
      bb.putInt(40).putInt(9).putInt(8).putShort(1).putShort(24)
      bb.putInt(0).putInt(224).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var i = 0
      while (bb.remaining() > 0) { bb.put((i * 37 % 251).toByte); i += 1 }
      bb.array()
    }
    // genuine stored-block grayscale PNG (9×8, all-128 pixels)
    val pngSeed = {
      val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      val ihdr = be32(13) ++ ascii("IHDR") ++ be32(9) ++ be32(8) ++
        Array[Byte](8, 0, 0, 0, 0) ++ be32(0)
      val raw = Array.tabulate[Byte](80)(i => if (i % 10 == 0) 0 else 0x80.toByte)
      val z = Array[Byte](0x78, 0x01, 0x01, 80, 0, (~80 & 0xff).toByte,
        (~0 & 0xff).toByte) ++ raw ++ be32(0)
      sig ++ be32(z.length) ++ ascii("IDAT") ++ z ++ be32(0) ++
        be32(0) ++ ascii("IEND") ++ be32(0)
    }
    // genuine GIF (9×8, 4-gray palette, clear-per-pixel 3-bit codes)
    val gifSeed = {
      // packed 0x81: GCT present, size bits 1 -> 2<<1 = 4 entries, matching
      // the 4 RGB entries written below and the 0-3 pixel indices emitted —
      // with 0x80 (2 entries) the scan rejects the seed at the palette
      // check and the fuzzer never mutates a stream that reaches the LZW
      // decoder (review finding r16)
      val head = ascii("GIF89a") ++ Array[Byte](9, 0, 8, 0, 0x81.toByte, 0, 0) ++
        Array[Byte](0, 0, 0, 85, 85, 85, -86, -86, -86, -1, -1, -1) ++
        Array[Byte](0x2C, 0, 0, 0, 0, 9, 0, 8, 0, 0, 2)
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nbits = 0
      def emit(c: Int): Unit = {
        acc |= c.toLong << nbits; nbits += 3
        while (nbits >= 8) { out.write((acc & 255).toInt); acc >>= 8; nbits -= 8 }
      }
      for (p <- 0 until 72) { emit(4); emit(p % 4) }
      emit(5)
      if (nbits > 0) out.write((acc & 255).toInt)
      val codes = out.toByteArray
      head ++ Array[Byte](codes.length.toByte) ++ codes ++
        Array[Byte](0, 0x3B)
    }
    // genuine Y4M (4×4 mono, 65 constant frames)
    val y4mSeed = ascii("YUV4MPEG2 W4 H4 Cmono\n") ++
      Array.tabulate(65)(f => ascii("FRAME\n") ++
        Array.fill[Byte](16)((100 + f).toByte)).flatten
    val gen = for {
      seed <- Gen.oneOf(Seq(jpeg, wav, mp4, flac, mp3, opus, mkv, bmpSeed,
        pngSeed, gifSeed, y4mSeed))
      cut <- Gen.chooseNum(0, seed.length)
      at <- Gen.chooseNum(0, math.max(0, seed.length - 1))
      v <- Arbitrary.arbitrary[Byte]
      mode <- Gen.oneOf("truncate", "mutate", "both")
    } yield {
      val m = seed.clone()
      if (mode != "truncate" && at < m.length) m(at) = v
      if (mode != "mutate") m.take(cut) else m
    }
    Prop.forAll(gen)(b => scansSucceed(b))
  }
}
