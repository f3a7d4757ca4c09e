package graft.queries

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{CsvCatalog, CsvDialect, CsvWrite}

/** Shared helpers for the declared query inventory (SURVEY.md §2.3). */
object Tables {
  /** Load one driver-generated parquet table (TESTDATA.md). */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Load `events`, normalizing `ts` to session-TZ TIMESTAMP across the
    * generator's storage choices (both observed across driver rounds):
    *
    *  - parquet TIMESTAMP(NANOS) — a type Spark's vectorized reader
    *    rejects outright; requires `spark.sql.legacy.parquet.nanosAsLong=
    *    true` (set ONCE at session build by Verify/Bench and the test
    *    harness — a query function must not silently mutate session
    *    conf), read as a nanos BIGINT and converted with integer division
    *    (ns values exceed 2^53, so a double-typed divide would lose
    *    micros);
    *  - parquet TIMESTAMP(MICROS) without isAdjustedToUTC — arrives as
    *    TIMESTAMP_NTZ, cast straight to TIMESTAMP (identical instants
    *    under the UTC session both mains pin).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw =
      try spark.read.parquet(s"$sfDir/events.parquet")
      catch {
        // keep the actionable message the old require() gave: Spark's raw
        // "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,...))" names the
        // problem but not the one-line fix
        case e: Exception if e.getMessage != null &&
            e.getMessage.contains("TIMESTAMP(NANOS") =>
          throw new IllegalStateException(
            "set spark.sql.legacy.parquet.nanosAsLong=true at session " +
              "build to read nanos-typed events", e)
      }
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Staging dir for round-trip fixtures: derived from (sf, tag) so
    * repeated calls in one process overwrite rather than accumulate, and
    * from the pid so concurrent runs of the same SF don't collide.
    * `kind` separates format families (csv, jsonl) — every round-trip
    * fixture shares this one scheme so staging hygiene changes in one
    * place.
    */
  private[queries] def stagingDir(sfDir: String, tag: String,
                                  kind: String = "csv"): Path = {
    val sf = Paths.get(sfDir).getFileName.toString
    val pid = ProcessHandle.current().pid()
    val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft-$kind-$pid", sf, tag)
    Files.createDirectories(dir)
    dir
  }

  /** Group-A fixture: round-trip a parquet table through our CSV sink and
    * source (write with reference dialect, read back all-string), so each
    * Group-A query exercises the real CSV semantics layer end-to-end.
    * Uses the PARTITIONED write + directory read — the 100 TB path; no
    * single-partition coalesce anywhere in the benched round trip.
    */
  def csvRoundTrip(spark: SparkSession, sfDir: String, table: String,
                   tag: String, dialect: CsvDialect = CsvDialect(),
                   prepare: DataFrame => DataFrame = identity): DataFrame = {
    val dir = stagingDir(sfDir, tag).resolve(table)
    CsvWrite.writeDir(prepare(apply(spark, sfDir, table)), dir.toString, dialect)
    CsvCatalog.readDir(spark, dir, dialect)
  }

  /** Single-file round-trip variant for fixtures that genuinely need one
    * file on disk (a5 appends raw bad bytes; a6 pins the no-header naming
    * of a single reference-style `<table>.csv`). Never used on big tables.
    */
  def csvRoundTripSingle(spark: SparkSession, sfDir: String, table: String,
                         tag: String, dialect: CsvDialect = CsvDialect(),
                         prepare: DataFrame => DataFrame = identity): Path = {
    val dir = stagingDir(sfDir, tag)
    CsvWrite.writeSingleFile(prepare(apply(spark, sfDir, table)),
      dir.toString, table, dialect)
  }
}
