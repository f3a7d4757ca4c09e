package graft.sources

import java.nio.charset.Charset
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.tempDir

/** Encodings (R15; reference src/CSVProvider.cs:603-616): UTF-8 (default),
  * UTF-16, Windows-1252, Windows-1251 — each must survive a write→read
  * round trip carrying text that only that encoding family can represent.
  */
class EncodingSpec extends AnyFunSuite {

  private def roundTrip(encoding: String, payload: String): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = CsvDialect(encoding = encoding)
    val dir = tempDir(s"enc")
    val f = CsvWrite.writeSingleFile(
      Seq(("1", payload)).toDF("id", "txt"), dir.toString, "t", d)
    // bytes really are in the requested encoding
    val raw = new String(Files.readAllBytes(f), Charset.forName(encoding))
    assert(raw.contains(payload), s"payload missing from $encoding bytes")
    // and the engine reads them back intact
    val back = CsvCatalog.readTable(spark, f, d).collect()
    assert(back.map(_.getString(1)).toSeq == Seq(payload))
  }

  test("UTF-8 round-trips mixed European + Cyrillic text") {
    roundTrip("UTF-8", "æøå кириллица")
  }

  test("UTF-16 round-trips mixed European + Cyrillic text") {
    roundTrip("UTF-16", "æøå кириллица")
  }

  test("Windows-1252 round-trips western European text") {
    roundTrip("windows-1252", "æøå àéü")
  }

  test("Windows-1251 round-trips Cyrillic text") {
    roundTrip("windows-1251", "кириллица текст")
  }
}
