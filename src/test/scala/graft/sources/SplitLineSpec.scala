package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Header-line splitter (R2/R3 support): RFC-4180 dialect with the quote
  * char doubling to escape itself — same dialect as the data path
  * (SURVEY.md §1.4).
  */
class SplitLineSpec extends AnyFunSuite {
  private val d = CsvDialect()

  test("plain fields split on the delimiter") {
    assert(CsvCatalog.splitLine("a;b;c", d) == Seq("a", "b", "c"))
  }

  test("empty fields are preserved, including trailing") {
    assert(CsvCatalog.splitLine(";a;;b;", d) == Seq("", "a", "", "b", ""))
  }

  test("quoted fields may contain the delimiter") {
    assert(CsvCatalog.splitLine("\"a;b\";c", d) == Seq("a;b", "c"))
  }

  test("doubled quote inside a quoted field decodes to one quote") {
    assert(CsvCatalog.splitLine("\"say \"\"hi\"\"\";x", d) == Seq("say \"hi\"", "x"))
  }

  test("alternate delimiter and quote chars") {
    val pipe = CsvDialect(delimiter = "|", quote = "'")
    assert(CsvCatalog.splitLine("'a|b'|c", pipe) == Seq("a|b", "c"))
  }
}
