package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of d55's snapshot diff — the release audit run as a
  * LIVE CDC gate: the NEW snapshot's documents arrive as a stream, and
  * each micro-batch is diffed against the standing (old) snapshot by
  * content fingerprint, emitting only rows that moved:
  * `added` (doc_id absent from the standing side) and `changed`
  * (present, fingerprint DEFINITELY differs — NULL <> NULL is unknown
  * and drops, d55's oracle-`<>` rule). `unchanged` rows — the vast
  * majority between real releases — are dropped inside the batch, so
  * the sink receives exactly the d55 rows for the documents seen so far.
  *
  * `removed` is NOT a streamable event — absence never arrives — so the
  * handle exposes [[Handle.removals]]: after the stream drains, the
  * standing ids never seen by any batch, one anti-join.
  * Union(emitted, removals) therefore equals the batch diff of the same
  * two snapshots (pinned in StreamSnapshotDiffSpec) — the
  * StreamIngestDedup batch-parity discipline.
  *
  * Scale shape: fingerprints compute scan-side on both sides (d55's
  * "the fp IS the shuffled payload" rule — text never shuffles); the
  * per-batch diff is one doc_id equi-join of a bounded batch against
  * one standing scan; the seen-id accumulator holds ONLY ids (8 bytes a
  * row at any corpus size), localCheckpoint'ed per batch so lineage
  * stays one plan deep instead of growing by a union per batch.
  */
object StreamSnapshotDiff {

  final class Handle private[StreamSnapshotDiff](
      val query: StreamingQuery,
      standingFp: DataFrame,
      seenIds: () => DataFrame) {
    /** Standing docs never seen by any drained batch — the `removed`
      * rows of the release diff. Call after the stream drains (e.g.
      * `query.processAllAvailable()`); mid-stream it classifies
      * not-yet-arrived docs as removed, the honest point-in-time answer.
      */
    def removals(): DataFrame =
      standingFp.join(seenIds(), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit("removed").as("status"),
          col("fp_old"), lit(null).cast("string").as("fp_new"))
  }

  /** Start the gate: `delta` streams the NEW snapshot's (doc_id, text);
    * `standing` is the OLD snapshot (doc_id, text). `sink` receives each
    * batch's added/changed rows `(doc_id, status, fp_old, fp_new)`.
    * At-least-once redeliveries drop deterministically: within a batch
    * the smallest (text, row-hash) survives (StreamIngestDedup's rule),
    * across batches first-arrival-wins via the seen-id anti-join.
    */
  def start(delta: DataFrame, standing: DataFrame, queryName: String,
            sink: (DataFrame, Long) => Unit): Handle = {
    // fingerprint + presence marker once, scan-side; presence rides its
    // own column, NOT fp NULLness (a NULL-text standing doc has a NULL
    // fp while being genuinely present — d55's marker rule)
    val standingFp = standing
      .select(col("doc_id"), md5(col("text")).as("fp_old"),
        lit(true).as("in_old"))
    var seen = standing.sparkSession.range(0).toDF("doc_id")
    val query = delta.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = DeterministicSurvivor.keepFirst(batch.toDF())
          .join(seen, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), md5(col("text")).as("fp_new"))
          .localCheckpoint(true)
        val diff = b.join(standingFp, Seq("doc_id"), "left_outer")
          .withColumn("status",
            when(col("in_old").isNull, "added").otherwise("changed"))
          // present-in-both rows survive only on a DEFINITE change
          .filter(col("in_old").isNull || col("fp_old") =!= col("fp_new"))
          .select(col("doc_id"), col("status"), col("fp_old"), col("fp_new"))
        sink(diff, batchId)
        seen = seen.unionByName(b.select("doc_id")).localCheckpoint(true)
      }
      .start()
    new Handle(query, standingFp.drop("in_old"), () => seen)
  }
}
