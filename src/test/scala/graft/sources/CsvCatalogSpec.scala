package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.{csvFile, tempDir}

/** Catalog semantics (R1/R2/R3): one table per file, header-or-positional
  * naming, duplicate headers are a hard error (where Spark alone would
  * silently suffix-dedup — reference src/CSVSourceReader.cs:245-273).
  */
class CsvCatalogSpec extends AnyFunSuite {
  private val d = CsvDialect()

  test("header row provides column names verbatim") {
    val dir = tempDir("cat")
    val f = csvFile(dir, "t.csv", "id;name;amount\n1;x;2\n")
    assert(CsvCatalog.columnNames(f, d) == Seq("id", "name", "amount"))
  }

  test("headerless files get positional 'Column i' names, 1-based") {
    val dir = tempDir("cat")
    val f = csvFile(dir, "t.csv", "1;x;2\n4;y;5\n")
    assert(CsvCatalog.columnNames(f, d.copy(hasHeader = false)) ==
      Seq("Column 1", "Column 2", "Column 3"))
  }

  test("duplicate non-empty header names are a hard error (R3)") {
    val dir = tempDir("cat")
    val f = csvFile(dir, "t.csv", "id;name;id\n1;x;2\n")
    val e = intercept[DuplicateHeaderException](CsvCatalog.columnNames(f, d))
    assert(e.getMessage.contains("id"))
  }

  test("readTable yields all-string columns and skips the header row") {
    val spark = TestSpark.spark
    val dir = tempDir("cat")
    val f = csvFile(dir, "t.csv", "id;name\n1;alpha\n2;beta\n")
    val df = CsvCatalog.readTable(spark, f, d)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 2)
    assert(df.collect().map(_.getString(1)).sorted.toSeq == Seq("alpha", "beta"))
  }

  test("load maps one table per top-level csv, named by file stem") {
    val spark = TestSpark.spark
    val dir = tempDir("cat")
    csvFile(dir, "customers.csv", "id\n1\n")
    csvFile(dir, "orders.csv", "id\n2\n3\n")
    csvFile(dir, "notes.txt", "ignored")
    java.nio.file.Files.createDirectory(dir.resolve("nested"))
    csvFile(dir.resolve("nested"), "inner.csv", "id\n9\n")
    val cat = CsvCatalog.load(spark, dir.toString, d)
    assert(cat.keySet == Set("customers", "orders")) // top-level only (R1)
    assert(cat("orders").count() == 2)
  }

  test("readDir handles a headerless partitioned directory with positional names") {
    val spark = TestSpark.spark
    val dir = tempDir("cat").resolve("nohdr")
    val noHeader = d.copy(hasHeader = false)
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1 to 40).map(i => org.apache.spark.sql.Row(i.toString, s"x$i")), 3),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.StringType))))
    CsvWrite.writeDir(src, dir.toString, noHeader)
    val back = CsvCatalog.readDir(spark, dir, noHeader)
    assert(back.columns.toSeq == Seq("Column 1", "Column 2"))
    assert(back.count() == 40)
  }

  test("readDir reads a partitioned directory written by writeDir") {
    val spark = TestSpark.spark
    val dir = tempDir("cat").resolve("out")
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1 to 100).map(i => org.apache.spark.sql.Row(i.toString, s"v$i")), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    CsvWrite.writeDir(src, dir.toString, d)
    val back = CsvCatalog.readDir(spark, dir, d)
    assert(back.columns.toSeq == Seq("id", "v"))
    assert(back.count() == 100)
  }
}
