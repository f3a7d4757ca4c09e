package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the exact-dedup operators (c1 keyed on d8's content
  * fingerprint): deduplicate an unbounded document stream by a normalized
  * md5 fingerprint, keeping the FIRST arrival per fingerprint, with state
  * bounded by the event-time watermark.
  *
  * `dropDuplicatesWithinWatermark` is the piece that makes this viable at
  * 100 TB/day: a plain `dropDuplicates` on a stream keeps every key ever
  * seen (unbounded state), while the within-watermark variant evicts
  * fingerprints once the watermark passes their event time + delay — the
  * standard "exact dedup inside the late-data horizon" contract a
  * training-data ingest pipeline wants. State is partitioned by the
  * 16-byte fingerprint, so it shards evenly across executors.
  */
object StreamingDedup {

  /** The same normalization + fingerprint as the batch d8 operator:
    * lowercase, crush non-alphanumerics, md5 of the token stream — so a
    * document dedups against itself regardless of whitespace/punctuation
    * differences, and the streaming and batch pipelines agree on identity.
    */
  def fingerprint(textCol: String): org.apache.spark.sql.Column =
    md5(concat_ws(" ",
      split(trim(lower(regexp_replace(col(textCol), "[^a-zA-Z0-9]+", " "))), " ")))

  /** Deduplicate `docs` (a streaming frame with an event-time column) by
    * content fingerprint. Emits each first arrival in append mode; a
    * duplicate arriving within `watermark` of the original's event time is
    * dropped; fingerprint state older than the watermark is evicted.
    */
  def dedupByContent(docs: DataFrame, textCol: String, tsCol: String,
                     watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("md5_fp", fingerprint(textCol))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("md5_fp")
}
