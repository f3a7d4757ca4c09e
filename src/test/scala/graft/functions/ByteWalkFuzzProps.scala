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
    ascii("BM"))

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
    val gen = for {
      seed <- Gen.oneOf(Seq(jpeg, wav, mp4, flac, mp3, opus, mkv, bmpSeed))
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
