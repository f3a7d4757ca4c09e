package graft.sources

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.TestSpark
import graft.TestSpark.tempDir

/** Writer row format (R11-R15; reference src/CSVDestinationWriter.cs:80-152):
  * quoteAll, bare NULL sentinel, newline stripping, the fixed
  * `dd-MM-yyyy HH:mm:ss:fff` timestamp pattern, lazy header, and the
  * `<table>[suffix].csv` naming scheme.
  */
class CsvWriteSpec extends AnyFunSuite {

  private def df(rows: Seq[Row], schema: StructType) = {
    val spark = TestSpark.spark
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  test("every non-null value is quoted; embedded newlines are stripped") {
    val dir = tempDir("w")
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType)))
    val f = CsvWrite.writeSingleFile(
      df(Seq(Row("line1\nline2", "x\r\ny")), schema), dir.toString, "t")
    val lines = java.nio.file.Files.readAllLines(f)
    assert(lines.size == 2)
    assert(lines.get(1) == "\"line1line2\";\"xy\"")
  }

  test("writeDir's null byte shape is the QUOTED sentinel (r18 doc pin)") {
    // the scale path (Spark's csv writer under quoteAll) writes NULL as
    // "NULL" — quoteAll covers the substituted nullValue string; the
    // reference's bare-NULL shape belongs to writeSingleFile's
    // referenceRecords fidelity path (pinned elsewhere in this suite)
    val dir = tempDir("wnull").resolve("out").toString
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType)))
    CsvWrite.writeDir(df(Seq(Row("x", null)), schema), dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part")).head
    val lines = java.nio.file.Files.readAllLines(part.toPath)
    assert(lines.get(1) == "\"x\";\"NULL\"", lines.toString)
  }

  test("timestamps are written as dd-MM-yyyy HH:mm:ss:fff (R13)") {
    val dir = tempDir("w")
    val schema = StructType(Seq(StructField("ts", TimestampNTZType)))
    val f = CsvWrite.writeSingleFile(
      df(Seq(Row(LocalDateTime.of(2024, 3, 5, 7, 8, 9, 123000000))), schema),
      dir.toString, "t")
    assert(java.nio.file.Files.readAllLines(f).get(1) == "\"05-03-2024 07:08:09:123\"")
  }

  test("header emits destination column names, quoted, when configured") {
    val dir = tempDir("w")
    val schema = StructType(Seq(
      StructField("col_x", StringType), StructField("col_y", StringType)))
    val f = CsvWrite.writeSingleFile(df(Seq(Row("1", "2")), schema), dir.toString, "t")
    assert(java.nio.file.Files.readAllLines(f).get(0) == "\"col_x\";\"col_y\"")
    val noHeader = CsvWrite.writeSingleFile(
      df(Seq(Row("1", "2")), schema), dir.toString, "t2",
      CsvDialect(hasHeader = false))
    assert(java.nio.file.Files.readAllLines(noHeader).get(0) == "\"1\";\"2\"")
  }

  test("file naming follows <table>.csv and <table>[suffix].csv (R15)") {
    val dir = tempDir("w")
    val schema = StructType(Seq(StructField("a", StringType)))
    val plain = CsvWrite.writeSingleFile(df(Seq(Row("1")), schema), dir.toString, "orders")
    assert(plain.getFileName.toString == "orders.csv")
    val stamped = CsvWrite.writeSingleFile(df(Seq(Row("1")), schema),
      dir.toString, "orders", CsvDialect(), Some("20240305-0708091234567"))
    assert(stamped.getFileName.toString == "orders[20240305-0708091234567].csv")
  }

  test("job culture formats fractional values with its decimal separator (R13)") {
    import org.apache.spark.sql.types.DoubleType
    assert(CsvWrite.cultureDecimalSeparator("") == '.')
    assert(CsvWrite.cultureDecimalSeparator("invariant") == '.')
    assert(CsvWrite.cultureDecimalSeparator("en-US") == '.')
    assert(CsvWrite.cultureDecimalSeparator("da-DK") == ',')
    assert(CsvWrite.cultureDecimalSeparator("de-DE") == ',')
    val dir = tempDir("w")
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("bal", DoubleType)))
    val data = df(Seq(Row("1", java.lang.Double.valueOf(1234.5))), schema)
    val danish = CsvWrite.writeSingleFile(data, dir.toString, "dk",
      CsvDialect(), None, culture = "da-DK")
    assert(java.nio.file.Files.readAllLines(danish).get(1) == "\"1\";\"1234,5\"")
    val invariant = CsvWrite.writeSingleFile(data, dir.toString, "inv")
    assert(java.nio.file.Files.readAllLines(invariant).get(1) == "\"1\";\"1234.5\"")
  }

  test("large doubles are written positionally, never scientific (R13)") {
    val dir = tempDir("w")
    val schema = StructType(Seq(
      StructField("big", DoubleType), StructField("small", DoubleType),
      StructField("f", FloatType)))
    val data = df(Seq(Row(
      java.lang.Double.valueOf(1.234e8),       // Spark cast would emit 1.234E8
      java.lang.Double.valueOf(0.5),
      java.lang.Float.valueOf(2.5e7f))), schema)
    val f = CsvWrite.writeSingleFile(data, dir.toString, "t")
    assert(java.nio.file.Files.readAllLines(f).get(1) ==
      "\"123400000.0\";\"0.5\";\"25000000.0\"")
    // culture translate applies to the positional form — no '1,234E8'
    val danish = CsvWrite.writeSingleFile(
      df(Seq(Row(java.lang.Double.valueOf(1.5e8),
        java.lang.Double.valueOf(0.25), java.lang.Float.valueOf(1.5f))), schema),
      dir.toString, "dk", CsvDialect(), None, culture = "da-DK")
    assert(java.nio.file.Files.readAllLines(danish).get(1) ==
      "\"150000000,0\";\"0,25\";\"1,5\"")
  }

  test("positional formatting round-trips and handles edge values") {
    import graft.functions.PlainDoubleString
    // whole doubles keep the trailing .0 at every magnitude (round-4 ADVICE:
    // previously 1.0e7 dropped it while 123456.0 kept it)
    assert(PlainDoubleString.format(1.0e7) == "10000000.0")
    assert(PlainDoubleString.format(-9.87e15) == "-9870000000000000.0")
    assert(PlainDoubleString.format(123456.0) == "123456.0")
    assert(PlainDoubleString.format(1.0e-7) == "0.0000001")
    assert(PlainDoubleString.format(0.1) == "0.1")          // shortest digits kept
    assert(PlainDoubleString.format(-0.0) == "-0.0")
    assert(PlainDoubleString.format(Double.NaN) == "NaN")
    assert(PlainDoubleString.format(Double.PositiveInfinity) == "Infinity")
    // round-trip: positional digits parse back to the identical bits
    for (v <- Seq(1.234e8, 3.3e300, 4.9e-324, 123456789.123456, -2.5e-10))
      assert(java.lang.Double.parseDouble(PlainDoubleString.format(v)) == v)
    assert(PlainDoubleString.format(2.5e7f) == "25000000.0") // float digits, not double's
  }

  test("DecimalType respects the culture separator (round-3 ADVICE)") {
    val dir = tempDir("w")
    val schema = StructType(Seq(StructField("d", DecimalType(10, 2))))
    val data = df(Seq(Row(new java.math.BigDecimal("1234.56"))), schema)
    val danish = CsvWrite.writeSingleFile(data, dir.toString, "dec",
      CsvDialect(), None, culture = "de-DE")
    assert(java.nio.file.Files.readAllLines(danish).get(1) == "\"1234,56\"")
  }

  test("autoSuffix generates the reference's yyyyMMdd-HHmmssFFFFFFF shape (R15)") {
    val fixed = java.time.LocalDateTime.of(2024, 3, 5, 7, 8, 9, 123456789)
    assert(CsvWrite.autoSuffix(fixed) == "20240305-0708091234567")
    assert(CsvWrite.autoSuffix().matches("""\d{8}-\d{13}"""))
  }

  test("writeDir produces a partitioned directory (the scale path)") {
    val dir = tempDir("w").resolve("out")
    val spark = TestSpark.spark
    val schema = StructType(Seq(StructField("a", StringType)))
    val many = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 50).map(i => Row(i.toString)), 4), schema)
    CsvWrite.writeDir(many, dir.toString)
    val parts = java.nio.file.Files.list(dir).iterator()
    var n = 0
    while (parts.hasNext) { if (parts.next().getFileName.toString.startsWith("part-")) n += 1 }
    assert(n > 1) // stays partitioned; no silent coalesce(1)
  }
}
