package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of d34's incremental near-dup dedup — the weekly-batch
  * ingest gate run as a LIVE stream: each micro-batch of arriving
  * documents is deduped against the standing corpus (base PLUS every
  * survivor of earlier batches), and only survivors pass to the sink.
  * First-arrival-wins extends across batches: a doc that near-duplicates
  * an already-accepted doc drops, exactly as d34 drops against the base.
  *
  * Per-batch relational logic (rarest-first inverted-index probes +
  * exact Jaccard verify) is not expressible as one append-mode streaming
  * plan, so each micro-batch runs the PROVEN batch body
  * ([[graft.queries.GroupD.incrementalDedupBatch]]) via `foreachBatch` —
  * StreamSearch's escape-hatch pattern. Batch parity is therefore by
  * CONSTRUCTION within a batch (pinned in StreamIngestDedupSpec), and
  * the only streaming-specific state is the standing frame itself.
  *
  * Scale shape: the probe side is the micro-batch (bounded by the
  * trigger), the standing side streams once per batch and is never
  * self-joined (d34's contract); survivors are localCheckpoint'ed before
  * joining the standing union so lineage stays one plan deep instead of
  * growing by the whole probe/verify DAG every batch. At 100 TB the
  * standing side would be a persisted table the sink appends to; the
  * in-memory union here is the same shape with the same single-scan
  * cost per batch.
  */
object StreamIngestDedup {

  /** Start the gate: `delta` is a streaming frame with (doc_id, text)
    * plus any passthrough columns; `base` the static standing corpus
    * (doc_id, text). `sink` receives each batch's SURVIVORS. At-least-
    * once sources can redeliver a doc_id within a batch — the batch is
    * deduped on doc_id first (StreamSearch's qid discipline), keeping a
    * DETERMINISTIC survivor (smallest (text, row-hash) — a
    * partition-order-dependent pick would violate the repo's
    * deterministic-tiebreak discipline when a redelivery carries
    * different passthrough values). The row-hash is `xxhash64` over all
    * delta columns, so passthrough columns must be hashable types (no
    * MapType — Spark's hash family rejects maps); that constraint is the
    * price of the deterministic pick.
    *
    * `standingStore`: optional parquet directory making the accepted set
    * DURABLE. Without it the standing accumulator lives only in driver
    * memory — a restart from the streaming checkpoint would reset it to
    * `base` and re-accept near-duplicates of pre-restart survivors. With
    * it, every batch's survivors append to the store (AFTER the sink
    * call: a crash between sink and append re-emits on replay —
    * at-least-once — instead of silently swallowing the batch), and
    * restart rebuilds standing = base ∪ store before the first batch.
    * The store rides [[StandingStore]]'s shared protocol (r18 review —
    * this gate previously swallowed ALL restore errors as "empty
    * store", silently discarding the accepted history on a transient
    * FS failure; now only "never written" maps to empty, damage and IO
    * failures fail the restart loudly), and every `compactEvery`
    * batches it compacts to one snapshot via the marker-adjudicated
    * swap while the in-memory union re-checkpoints back to a single
    * plan leaf (each batch's union otherwise adds a leaf and analysis
    * cost grows without bound on a long-running gate — the
    * [[StreamImageDedup]] discipline).
    */
  def start(delta: DataFrame, base: DataFrame, queryName: String,
            sink: (DataFrame, Long) => Unit,
            standingStore: Option[String] = None,
            compactEvery: Int = 8): StreamingQuery =
    // the order-sensitive store protocol (restore adjudication, union
    // re-checkpoint cadence, sink-before-append, compaction) lives in
    // the shared skeleton (r19) — this gate supplies only its rule
    StandingGate.start(delta, base.select(col("doc_id"), col("text")),
        queryName, sink, standingStore, compactEvery,
        storeCols = Seq("doc_id", "text"), dedupKey = "doc_id") {
      (batch, standing, _) =>
        // at-least-once sources can also redeliver a doc ACROSS batches:
        // an id already accepted into the standing side is a duplicate
        // arrival, not a new document — without this anti-join it would
        // re-emit AND union into standing twice, doubling its shingle
        // rows and corrupting every later Jaccard count it touches
        val b = DeterministicSurvivor.keepFirst(batch)
          .join(standing.select("doc_id"), Seq("doc_id"), "left_anti")
        val survivors =
          graft.queries.GroupD.incrementalDedupBatch(standing, b)
        // eager local checkpoint: truncates lineage AND materializes the
        // survivor set once, so the sink read and the standing union both
        // reuse it instead of re-running the probe/verify plan
        val kept = survivors.localCheckpoint(true)
        (kept, kept.select("doc_id", "text"))
    }
}
