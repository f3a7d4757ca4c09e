package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** The shared foreachBatch SKELETON of the standing-store ingest gates
  * ([[StreamIngestDedup]] — text, [[StreamImageDedup]] — perceptual
  * hashes, [[StreamUrlDedup]] — canonical URLs), extracted in r19 so the
  * ORDER-SENSITIVE protocol lives in one audited place instead of three
  * conventions (review finding: a future edit re-ordering one copy —
  * append before sink, or decoupling the two compaction arms — would
  * silently break that gate's crash contract while the other copies
  * stayed correct):
  *
  *   1. restore: standing = initial ∪ [[StandingStore.readStore]]
  *      (marker-adjudicated; damage fails the restart loudly);
  *   2. per batch: the gate's own rule maps (batch, standing, batchId) →
  *      (kept, standingDelta) — kept goes to the sink, standingDelta
  *      (already in the standing frame's schema) joins the standing
  *      side;
  *   3. the in-memory union re-checkpoints to ONE plan leaf every
  *      `compactEvery` batches (each batch's union otherwise adds a
  *      leaf and analysis cost grows without bound on a long-running
  *      gate) — and this happens BEFORE the store compaction in the
  *      same batch, so the next batch's plan never reads parquet files
  *      the compaction swap just deleted;
  *   4. the sink call precedes the store append — a crash between them
  *      re-emits on replay (at-least-once) instead of silently
  *      swallowing the batch;
  *   5. every `compactEvery` batches the store compacts to one deduped
  *      snapshot via [[StandingStore.compactStore]]'s marker-
  *      adjudicated swap.
  */
private[streaming] object StandingGate {

  /** `checkpointRestore`: eagerly materialize the restored standing
    * frame before the first batch (the image gate's choice — its
    * standing side is decode-derived and tiny; a plain-table base like
    * the ingest gate's is cheaper to stream per batch than to copy).
    */
  def start(delta: DataFrame, initialStanding: DataFrame,
            queryName: String, sink: (DataFrame, Long) => Unit,
            standingStore: Option[String], compactEvery: Int,
            storeCols: Seq[String], dedupKey: String,
            checkpointRestore: Boolean = false)
           (perBatch: (DataFrame, DataFrame, Long) => (DataFrame, DataFrame))
      : StreamingQuery = {
    require(compactEvery > 0, s"compactEvery must be positive: $compactEvery")
    val spark = initialStanding.sparkSession
    val persisted = standingStore.flatMap(dir =>
      StandingStore.readStore(spark, dir, storeCols))
    var standing = persisted.foldLeft(initialStanding)(_ unionByName _)
    if (checkpointRestore) standing = standing.localCheckpoint(true)
    var batches = 0L
    delta.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val (kept, standingDelta) = perBatch(batch.toDF(), standing, batchId)
        standing = standing.unionByName(standingDelta)
        batches += 1
        if (batches % compactEvery == 0)
          standing = standing.localCheckpoint(true)
        sink(kept, batchId)
        standingStore.foreach { dir =>
          standingDelta.write.mode("append").parquet(dir)
          if (batches % compactEvery == 0)
            StandingStore.compactStore(spark, dir, storeCols, dedupKey)
        }
      }
      .start()
  }
}
