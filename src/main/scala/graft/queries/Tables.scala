package graft.queries

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{CsvCatalog, CsvDialect, CsvWrite}

/** Shared helpers for the declared query inventory (SURVEY.md §2.3). */
object Tables {
  /** Load one driver-generated parquet table (TESTDATA.md). */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Group-A fixture: round-trip a parquet table through our CSV sink and
    * source (write with reference dialect, read back all-string), so each
    * Group-A query exercises the real CSV semantics layer end-to-end.
    * The staging dir is derived from (sfDir, table, tag) so repeated calls
    * overwrite rather than accumulate.
    */
  def csvRoundTrip(spark: SparkSession, sfDir: String, table: String,
                   tag: String, dialect: CsvDialect = CsvDialect(),
                   prepare: DataFrame => DataFrame = identity): DataFrame = {
    val sf = Paths.get(sfDir).getFileName.toString
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft-csv", sf, tag)
    Files.createDirectories(dir)
    val src = prepare(apply(spark, sfDir, table))
    val file = CsvWrite.writeSingleFile(src, dir.toString, table, dialect)
    CsvCatalog.readTable(spark, file, dialect)
  }
}
