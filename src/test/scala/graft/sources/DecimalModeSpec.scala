package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}
import graft.operators.{ColumnMapping, Mapping}

/** Decimal-separator modes (R8; reference src/CSVSourceReader.cs:226-241,
  * mode selection src/CSVProvider.cs:470-475): Comma replaces, Dot is a
  * plain parse, Detect tries as-is then separator-swapped, None passes
  * through (invariant culture = plain parse).
  */
class DecimalModeSpec extends AnyFunSuite {

  private def parse(values: Seq[String], mode: DecimalMode): Seq[Double] = {
    val dir = tempDir("dec")
    val body = values.zipWithIndex.map { case (v, i) => s"$i;$v" }.mkString("\n")
    val f = csvFile(dir, "t.csv", s"id;val\n$body\n")
    val df = CsvCatalog.readTable(TestSpark.spark, f, CsvDialect())
    Mapping("t", "out", Seq(
      ColumnMapping(Some("id"), "id", castTo = Some(LongType)),
      ColumnMapping(Some("val"), "v", castTo = Some(DoubleType), decimalMode = mode),
    )).compile(df).orderBy("id").collect().map(_.getDouble(1)).toSeq
  }

  test("Comma mode: ',' is the decimal separator") {
    assert(parse(Seq("1,5", "2,25"), DecimalMode.Comma) == Seq(1.5, 2.25))
  }

  test("Dot mode: plain parse") {
    assert(parse(Seq("1.5", "2.25"), DecimalMode.Dot) == Seq(1.5, 2.25))
  }

  test("Detect mode: parses either separator per value") {
    assert(parse(Seq("1.5", "2,25", "3"), DecimalMode.Detect) == Seq(1.5, 2.25, 3.0))
  }

  test("None mode: invariant parse of dot-formatted text") {
    assert(parse(Seq("4.75"), DecimalMode.None) == Seq(4.75))
  }

  test("unparseable text under Detect falls through and fails the cast") {
    assertThrows[Exception] {
      parse(Seq("not-a-number"), DecimalMode.Detect)
    }
  }
}
