package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.Charset
import java.nio.file.{Files, Path, Paths}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Raised when a header row repeats a non-empty column name — the reference
  * treats this as a hard error (reference: src/CSVSourceReader.cs:245-273)
  * where Spark would silently suffix-dedup. SURVEY.md §2.1 R3.
  */
final class DuplicateHeaderException(table: String, dups: Seq[String])
    extends RuntimeException(
      s"Duplicate columns in table '$table': ${dups.mkString(", ")}")

/** CSV source catalog: one table per `*.csv` file (top-level only), table
  * name = file stem, every column typed string — the reference's schema
  * model (src/CSVProvider.cs:155-198, 281-315, 641-656; SURVEY.md §1.1-§1.3).
  *
  * Scale note: only the single header line of each file is read on the
  * driver (schema is metadata); the data read is a plain distributed
  * `spark.read.csv` with an explicit schema, so Spark's vectorized CSV
  * scan, partitioned splits, and filter/column pushdown all apply.
  */
object CsvCatalog {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Minimal RFC-4180 field splitter for ONE line (the header). Quote char
    * doubles to escape itself — same dialect as the data path (§1.4).
    * Driver-side, O(header length); never used for data rows.
    */
  private[sources] def splitLine(line: String, dialect: CsvDialect): Seq[String] = {
    val d = dialect.delimiter.head
    val q = dialect.quote.head
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == q) {
          if (i + 1 < line.length && line.charAt(i + 1) == q) { cur += q; i += 1 }
          else inQuotes = false
        } else cur += c
      } else c match {
        case `q` => inQuotes = true
        case `d` => out += cur.result(); cur.clear()
        case _   => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  private def firstLine(file: Path, encoding: String): Option[String] = {
    val in = Files.newInputStream(file)
    try {
      val r = new BufferedReader(new InputStreamReader(in, Charset.forName(encoding)))
      Option(r.readLine())
    } finally in.close()
  }

  /** Column names for one file, reference-style: header row verbatim when
    * `hasHeader`, else positional `"Column 1".."Column N"` (1-based —
    * reference src/CSVProvider.cs:290-305). Throws
    * [[DuplicateHeaderException]] on repeated non-empty header names (R3).
    */
  def columnNames(file: Path, dialect: CsvDialect): Seq[String] = {
    val table = stem(file)
    firstLine(file, dialect.encoding) match {
      case None => Seq.empty
      case Some(line) =>
        val fields = splitLine(line, dialect)
        if (dialect.hasHeader) {
          val dups = fields.filter(_.nonEmpty).groupBy(identity)
            .collect { case (name, occ) if occ.size > 1 => name }.toSeq.sorted
          if (dups.nonEmpty) throw new DuplicateHeaderException(table, dups)
          fields
        } else fields.indices.map(i => s"Column ${i + 1}")
    }
  }

  /** Table name = file name without extension (src/CSVProvider.cs:183). */
  def stem(file: Path): String = {
    val n = file.getFileName.toString
    val dot = n.lastIndexOf('.')
    if (dot > 0) n.substring(0, dot) else n
  }

  private def allStringSchema(names: Seq[String]): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  /** Read one CSV file as an all-string DataFrame with reference naming.
    * An explicit schema is always supplied, so the header line (when
    * present) is skipped rather than re-inferred, and malformed-row policy
    * ([[MalformedMode]]) applies to data rows only.
    *
    * Legacy encodings (UTF-16, windows-125x — R15) are transcoded to a
    * UTF-8 staging copy at the file boundary before the distributed read:
    * Spark's CSV line splitter is only reliable on UTF-8-compatible bytes,
    * and the legacy-encoding feature exists for the reference's
    * small-single-file integration mode, not the 100 TB path (which is
    * UTF-8 throughout). Constraints of that staging copy: it is a
    * DRIVER-LOCAL temp file (only visible to executors in local mode — on
    * a real cluster a legacy file would need staging to shared storage),
    * CRLF line endings are normalized to LF, and copies are CACHED per
    * (source file, mtime, encoding) — the read is lazy, so the copy cannot
    * be deleted eagerly; caching bounds the footprint at one live copy per
    * distinct source file instead of one per readTable call, and a changed
    * mtime deletes the superseded copy.
    */
  def readTable(spark: SparkSession, file: Path, dialect: CsvDialect): DataFrame = {
    val names = columnNames(file, dialect)
    val dataFile =
      if (dialect.encoding.equalsIgnoreCase("UTF-8")) file
      else transcodeToUtf8(file, dialect.encoding)
    spark.read
      .options(dialect.readOptions + ("encoding" -> "UTF-8"))
      .schema(allStringSchema(names))
      .csv(dataFile.toString)
  }

  /** (source absolute path, encoding) -> (source mtime millis, staged copy). */
  private val transcodeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (Long, Path)]()

  private def transcodeToUtf8(file: Path, encoding: String): Path = {
    val key = (file.toAbsolutePath.toString, encoding.toLowerCase)
    val mtime = Files.getLastModifiedTime(file).toMillis
    transcodeCache.compute(key, (_, prev) => prev match {
      case (`mtime`, cached) if Files.exists(cached) => prev
      case _ =>
        if (prev != null) Files.deleteIfExists(prev._2) // superseded copy
        val tmp = Files.createTempFile(s"graft-utf8-${stem(file)}", ".csv")
        tmp.toFile.deleteOnExit()
        val in = new BufferedReader(new InputStreamReader(
          Files.newInputStream(file), Charset.forName(encoding)))
        val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          Files.newOutputStream(tmp), Charset.forName("UTF-8")))
        try {
          var line = in.readLine()
          while (line != null) { out.write(line); out.write("\n"); line = in.readLine() }
        } finally { in.close(); out.close() }
        (mtime, tmp)
    })._2
  }

  /** Read a DIRECTORY of CSV part files (the output of
    * [[CsvWrite.writeDir]]) as one all-string DataFrame. This is the 100 TB
    * read path: Spark scans all parts in parallel with an explicit schema
    * (header lines, when present, are skipped per file), and `_SUCCESS` /
    * dot-files are ignored by the source. Column names are probed from the
    * first non-empty part on the driver — O(one line), like [[columnNames]].
    */
  def readDir(spark: SparkSession, dir: Path, dialect: CsvDialect): DataFrame = {
    val s = Files.list(dir)
    val probe = try s.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".") &&
            Files.size(p) > 0
        }
        .toSeq.sortBy(_.getFileName.toString).headOption
      finally s.close()
    val first = probe.getOrElse(
      throw new IllegalStateException(s"no non-empty CSV part files in $dir"))
    spark.read
      .options(dialect.readOptions)
      .schema(allStringSchema(columnNames(first, dialect)))
      .csv(dir.toString)
  }

  /** Enumerate `*.csv` directly inside `dir` (top-level only, like the
    * reference's `GetSourceFiles`, src/CSVProvider.cs:641-656).
    */
  def sourceFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.toLowerCase.endsWith(".csv"))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  /** Load a directory: one (tableName → DataFrame) per CSV file. Files
    * whose header cannot be parsed are dropped from the catalog with a
    * logged error, mirroring the reference's BadDataException handler
    * (src/CSVProvider.cs:307-313).
    */
  def load(spark: SparkSession, dir: String,
           dialect: CsvDialect = CsvDialect()): Map[String, DataFrame] = {
    val entries = sourceFiles(Paths.get(dir)).flatMap { f =>
      try Some(stem(f) -> readTable(spark, f, dialect))
      catch {
        case e: DuplicateHeaderException => throw e // hard error, R3
        case e: Exception =>
          log.error(s"[graft] dropping table '${stem(f)}': ${e.getMessage}")
          None
      }
    }
    ListMap(entries: _*)
  }
}
