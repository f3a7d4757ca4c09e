package graft.streaming

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{CsvCatalog, CsvDialect}

/** Structured Streaming file-source twin of the batch CSV catalog. The
  * reference's two stream-adjacent behaviors map here directly
  * (SURVEY.md §1.1, §2.2):
  *   - the 5-second file-stability gate (src/CSVProvider.cs:673-700) is
  *     subsumed by the file source's commit protocol — a file is processed
  *     exactly once, only after it is listed complete;
  *   - delete-after-ingest (src/CSVProvider.cs:355-361, 658-671) maps to
  *     `cleanSource=delete` (or `archive`), applied after a file's batch
  *     commits rather than after the whole run.
  *
  * The same dialect → options mapping as the batch path, so a pipeline can
  * switch between `spark.read` and `spark.readStream` without changing
  * semantics.
  */
object CsvStream {

  /** Open a streaming scan over a directory of CSV files. The schema is
    * probed from one existing file (streams require a static schema up
    * front — reference-style header-or-positional naming, R2/R3 included
    * via [[CsvCatalog.columnNames]]).
    *
    * `explicitSchema` makes a restart SELF-SUFFICIENT (r18 review): with
    * `cleanSource=delete` (the reference's delete-after-ingest mapping)
    * a stream that consumed and deleted every file has nothing left to
    * probe, so reopening from the checkpoint would fail despite all
    * prior batches having committed. Callers running a cleaning source
    * should capture the first open's schema (`df.schema`) beside their
    * checkpoint and pass it back on restart; probing stays the
    * zero-ceremony default for non-cleaning sources.
    */
  def readStream(spark: SparkSession, dir: Path,
                 dialect: CsvDialect = CsvDialect(),
                 schemaProbe: Option[Path] = None,
                 maxFilesPerTrigger: Int = 1000,
                 cleanSource: String = "off",
                 explicitSchema: Option[org.apache.spark.sql.types.StructType]
                   = None): DataFrame = {
    val schema = explicitSchema.getOrElse {
      val probe = schemaProbe.orElse(CsvCatalog.sourceFiles(dir).headOption)
        .getOrElse(throw new IllegalArgumentException(
          s"no CSV file in $dir to probe the stream schema from (for a " +
            "cleanSource stream restarting after full ingest, pass " +
            "explicitSchema)"))
      val names = CsvCatalog.columnNames(probe, dialect)
      org.apache.spark.sql.types.StructType(names.map(
        org.apache.spark.sql.types.StructField(_,
          org.apache.spark.sql.types.StringType, nullable = true)))
    }
    spark.readStream
      .options(dialect.readOptions)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .option("cleanSource", cleanSource)
      .schema(schema)
      .csv(dir.toString)
  }

  /** Open a streaming CSV SINK with the same dialect mapping as the batch
    * writer — the destination-provider twin of [[readStream]], so the
    * reference's source→destination dataflow also runs as an unbounded
    * pipeline. Rows are pre-formatted by the batch writer's own column
    * formatter ([[graft.sources.CsvWrite.formatForWrite]]: fixed timestamp
    * pattern, positional doubles, culture separator), so streamed bytes
    * match batch bytes. The file sink is exactly-once under a checkpoint
    * (same commit-log mechanism CsvStreamSpec pins for parquet).
    *
    * Returns the unstarted writer so callers pick trigger/output mode;
    * append is the only mode a file sink supports.
    */
  def writeStream(df: DataFrame, dir: Path, checkpoint: Path,
                  dialect: CsvDialect = CsvDialect(),
                  culture: String = ""): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    graft.sources.CsvWrite.formatForWrite(df, culture)
      .writeStream
      .format("csv")
      .options(dialect.writeOptions)
      .option("path", dir.toString)
      .option("checkpointLocation", checkpoint.toString)
      .outputMode("append")

  /** Tumbling event-time window aggregation with a watermark — b16's
    * streaming twin. The GROUPING KEY must be the event-time `window(...)`
    * struct itself: grouping by `window(...).start` strips the event-time
    * attribute, so append mode fails analysis and watermark state eviction
    * never binds (state would grow without bound). The struct is flattened
    * to a `bucket` timestamp only AFTER the aggregation, so callers see the
    * same shape as the batch b16 while the stream runs in append mode with
    * bounded state.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     window: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window),
        col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col(keyCol), col("n"))
}
