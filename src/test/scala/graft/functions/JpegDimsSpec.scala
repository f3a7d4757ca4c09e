package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The JPEG marker-chain walk ([[JpegDims.scan]]): segment skipping, fill
  * bytes, progressive SOF2, standalone markers, and every refusal path.
  */
class JpegDimsSpec extends AnyFunSuite {
  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private val app0 = Seq(0xFF, 0xE0, 0x00, 0x10, 'J'.toInt, 'F'.toInt,
    'I'.toInt, 'F'.toInt, 0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01,
    0x00, 0x00)
  private def sof(marker: Int, h: Int, w: Int) = Seq(
    0xFF, marker, 0x00, 0x11, 0x08, h >> 8, h & 0xff, w >> 8, w & 0xff,
    0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)

  test("baseline SOF0 behind APP0 parses") {
    val b = bytes(Seq(0xFF, 0xD8) ++ app0 ++ sof(0xC0, 480, 640): _*)
    assert(JpegDims.scan(b).toSeq == Seq(640, 480))
  }

  test("progressive SOF2 parses; fill FF bytes before markers are skipped") {
    val b = bytes(Seq(0xFF, 0xD8, 0xFF) ++ // extra fill byte
      app0 ++ Seq(0xFF) ++ sof(0xC2, 1080, 1920): _*)
    assert(JpegDims.scan(b).toSeq == Seq(1920, 1080))
  }

  test("DHT (C4) is a table segment, not a SOF — it must be skipped") {
    val dht = Seq(0xFF, 0xC4, 0x00, 0x05, 0x00, 0x01, 0x02)
    val b = bytes(Seq(0xFF, 0xD8) ++ dht ++ sof(0xC1, 10, 20): _*)
    assert(JpegDims.scan(b).toSeq == Seq(20, 10))
  }

  test("a buffer ending exactly at the SOF width field still parses") {
    // all four dimension bytes present, nothing after: b.length == j+8
    val sofPrefix = Seq(0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0x07, 0x00, 0x09)
    val b = bytes(Seq(0xFF, 0xD8) ++ app0 ++ sofPrefix: _*)
    assert(JpegDims.scan(b).toSeq == Seq(9, 7))
  }

  test("DNL-deferred height (SOF height=0) is unparseable, not img_height=0") {
    // ITU T.81 §B.2.2 allows SOF height 0 with the real value in a later
    // DNL marker; the scan must refuse rather than report a 0 dimension
    val hZero = bytes(Seq(0xFF, 0xD8) ++ app0 ++ sof(0xC0, 0, 640): _*)
    val wZero = bytes(Seq(0xFF, 0xD8) ++ app0 ++ sof(0xC0, 480, 0): _*)
    assert(JpegDims.scan(hZero) == null)
    assert(JpegDims.scan(wZero) == null)
  }

  test("refusals: no SOI, EOI before SOF, truncation, bad length, null") {
    assert(JpegDims.scan(bytes(0x89, 0x50, 0x4E, 0x47)) == null)
    assert(JpegDims.scan(bytes(0xFF, 0xD8, 0xFF, 0xD9)) == null) // EOI first
    assert(JpegDims.scan(bytes(Seq(0xFF, 0xD8) ++ app0.take(6): _*)) == null)
    assert(JpegDims.scan(bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x01)) == null)
    assert(JpegDims.scan(null) == null)
    assert(JpegDims.scan(Array.emptyByteArray) == null)
  }

  test("interpreted eval and codegen agree (the expression contract)") {
    val spark = graft.TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val good = bytes(Seq(0xFF, 0xD8) ++ app0 ++ sof(0xC0, 7, 9): _*)
    val rows = Seq((1L, good), (2L, bytes(1, 2, 3, 4)))
      .toDF("id", "content")
      .selectExpr("id", s"${GraftFunctions.JpegDimsName}(content) AS dims")
      .orderBy("id").collect()
    assert(rows(0).getSeq[Int](1) == Seq(9, 7))
    assert(rows(1).isNullAt(1))
  }
}
