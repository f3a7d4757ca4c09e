package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}

/** NULL sentinel + whitespace semantics on the data-read path (R7;
  * reference src/CSVSourceReader.cs:221-224, 48).
  *
  * Documented deviations from the reference (SURVEY.md §2.4):
  *   - the reference nulls only the UNQUOTED token `NULL`; Spark's parser
  *     applies the sentinel after unquoting, so quoted `"NULL"` also reads
  *     as null;
  *   - the reference trims inside quotes too; Spark trims unquoted fields
  *     only.
  * Both behaviors are pinned here so any engine upgrade that shifts them
  * is caught.
  */
class NullSentinelSpec extends AnyFunSuite {
  private val d = CsvDialect()

  private def readRow(content: String): org.apache.spark.sql.Row = {
    val dir = tempDir("null")
    val f = csvFile(dir, "t.csv", content)
    CsvCatalog.readTable(TestSpark.spark, f, d).collect().head
  }

  test("unquoted NULL decodes to SQL null; quoted empty survives as ''") {
    val r = readRow("a;b;c;e\nNULL;;\"\";x\n")
    assert(r.isNullAt(0))        // unquoted NULL -> null (reference exact)
    assert(r.isNullAt(1))        // unquoted empty -> null
    assert(r.getString(2) == "") // quoted "" -> empty string
    assert(r.getString(3) == "x")
  }

  test("quoted \"NULL\" also decodes to null (documented deviation)") {
    val r = readRow("a\n\"NULL\"\n")
    assert(r.isNullAt(0))
  }

  test("unquoted fields are trimmed; quoted fields keep inner whitespace") {
    val r = readRow("a;b\n  x  ;\" y \"\n")
    assert(r.getString(0) == "x")
    assert(r.getString(1) == " y ")
  }

  test("write emits bare unquoted NULL for nulls and quotes everything else") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tempDir("null")
    val df = Seq((Some("v"), Option.empty[String])).toDF("a", "b")
    val f = CsvWrite.writeSingleFile(df, dir.toString, "t", d)
    val lines = java.nio.file.Files.readAllLines(f)
    assert(lines.get(0) == "\"a\";\"b\"")
    assert(lines.get(1) == "\"v\";NULL")
  }
}
