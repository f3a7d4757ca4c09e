package graft.queries

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{CsvCatalog, CsvDialect, CsvWrite}

/** Shared helpers for the declared query inventory (SURVEY.md §2.3). */
object Tables {
  /** Load one driver-generated parquet table (TESTDATA.md). */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Load `events`, whose `ts` is parquet TIMESTAMP(NANOS) — a type Spark's
    * vectorized reader rejects outright. Read it as a nanos-since-epoch
    * long (legacy.parquet.nanosAsLong) and convert with integer division
    * (ns values exceed 2^53, so a double-typed divide would lose micros).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

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
