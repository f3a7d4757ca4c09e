package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, FloatType, TimestampNTZType, TimestampType}

/** CSV sink with the reference's row format (src/CSVDestinationWriter.cs:80-152;
  * SURVEY.md §2.1 R11-R15):
  *   - every non-NULL value quoted (`quoteAll`), NULL written as the bare
  *     sentinel (:129-132);
  *   - embedded newlines stripped from values (:89) — the reference strips
  *     them from the already-joined record; stripping per-field is
  *     equivalent given it also never escapes quotes;
  *   - timestamps formatted `dd-MM-yyyy HH:mm:ss:fff` (:98-102, 118-127);
  *   - header emitted per config (:82-85, 146-152);
  *   - optional timestamped file name `<table>[<suffix>].csv` (:23-28).
  *
  * Scale note: the default is a partitioned directory write (what a
  * 1000-executor cluster needs); `writeSingleFile` is the small-data
  * fidelity mode matching the reference's one-file-per-table output — it
  * coalesces to 1 partition and renames the part file, and should never be
  * used for large tables.
  */
object CsvWrite {

  /** Reference timestamp format dd-MM-yyyy HH:mm:ss:fff → Spark pattern. */
  val TimestampPattern = "dd-MM-yyyy HH:mm:ss:SSS"

  /** Format a DataFrame's columns the way the reference's writer does:
    * timestamps/dates via the fixed pattern, everything else via plain
    * string conversion (invariant culture), newlines stripped.
    */
  def formatForWrite(df: DataFrame): DataFrame = {
    val cols: Seq[Column] = df.schema.fields.map { f =>
      val c = col(f.name)
      val formatted = f.dataType match {
        case TimestampType | TimestampNTZType | DateType =>
          date_format(c, TimestampPattern)
        case DoubleType | FloatType   => c.cast("string")
        case _                        => c.cast("string")
      }
      regexp_replace(formatted, "[\\r\\n]", "").as(f.name)
    }
    df.select(cols: _*)
  }

  /** Distributed write: a directory of part files. This is the 100 TB path. */
  def writeDir(df: DataFrame, dir: String, dialect: CsvDialect = CsvDialect()): Unit =
    formatForWrite(df).write.mode("overwrite")
      .options(dialect.writeOptions).csv(dir)

  /** Fidelity-mode write: exactly one `<table>[suffix].csv` file in `dir`,
    * like the reference (src/CSVDestinationWriter.cs:17-33, 61-62).
    * Only for small outputs — forces a single partition.
    */
  def writeSingleFile(df: DataFrame, dir: String, table: String,
                      dialect: CsvDialect = CsvDialect(),
                      timestampSuffix: Option[String] = None): Path = {
    val destDir = Paths.get(dir)
    Files.createDirectories(destDir) // reference auto-creates (:61-62)
    val tmp = Files.createTempDirectory(destDir, s".$table-stage")
    try {
      formatForWrite(df).coalesce(1).write.mode("overwrite")
        .options(dialect.writeOptions).csv(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
      val name = timestampSuffix match {
        case Some(ts) => s"$table[$ts].csv"
        case None     => s"$table.csv"
      }
      val dest = destDir.resolve(name)
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      dest
    } finally {
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists)
    }
  }
}
