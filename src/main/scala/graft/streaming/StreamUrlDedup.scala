package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.GroupC

/** Streaming twin of d92's canonical-URL exact dedup — the URL axis's
  * live-ingest half (r19, closing the axis: c13 normalize → d92 dedup →
  * d91 cap now has batch, e2e-compose AND streaming legs, matching the
  * text and image modalities). Each micro-batch of arriving (doc_id, url)
  * rows is canonicalized through c13's [[GroupC.urlNormalize]] kernel and
  * gated against the standing set of already-accepted canonical URLs;
  * only first arrivals pass to the sink. First-arrival-wins extends
  * across batches, exactly as d92 keeps the smallest doc_id per
  * canonical URL within one corpus.
  *
  * REFUSALS PASS THROUGH (the monotone-gate contract): a URL the kernel
  * refuses (no `scheme://`, multi-colon authority → norm_url NULL)
  * cannot be keyed, and a gate that cannot judge a row must not drop
  * it — refused rows emit with `norm_url` NULL and never enter the
  * standing set. Consequently a REDELIVERED refused row re-emits
  * (at-least-once passthrough); dedup of un-keyable docs belongs to a
  * content gate ([[StreamIngestDedup]]), not a URL gate. Redeliveries
  * of ACCEPTED docs drop for free: the same raw URL canonicalizes to
  * the same standing key.
  *
  * Scale shape: the batch side is trigger-bounded; the standing side is
  * a single-column frame of canonical-URL strings that streams once per
  * batch through one LEFT ANTI join (never self-joined); survivors are
  * localCheckpoint'ed so the sink read and the standing union reuse one
  * materialization, and the union re-checkpoints every `compactEvery`
  * batches so lineage stays one plan deep on a long-running gate. At
  * 100 TB the standing side is the persisted canonical-URL table the
  * sink appends to — the same one d92 would bootstrap.
  */
object StreamUrlDedup {

  /** Start the gate: `delta` is a streaming frame with (doc_id, url)
    * plus any passthrough columns (hashable types — the
    * [[DeterministicSurvivor]] constraint); `base` a static frame with
    * a `norm_url` column of ALREADY-canonical URLs (d92's output shape —
    * pass an empty frame for a cold start). `sink` receives each batch's
    * survivors with their `norm_url` attached (NULL on the refused
    * passthrough arm).
    *
    * Within a batch, at-least-once redelivery of a doc_id keeps one
    * deterministic row ([[DeterministicSurvivor]] keyed on url), then
    * d92's keeper rule applies: smallest doc_id per canonical URL (a
    * WindowGroupLimit — map-side top-1 per key before the exchange).
    *
    * `standingStore`: optional parquet directory making the accepted
    * key set DURABLE via [[StandingStore]]'s marker-adjudicated
    * protocol — per-batch appends AFTER the sink call (a crash between
    * sink and append re-emits on replay — at-least-once — instead of
    * silently swallowing the batch), compaction to one deduped snapshot
    * every `compactEvery` batches, loud restart on damage.
    */
  def start(delta: DataFrame, base: DataFrame, queryName: String,
            sink: (DataFrame, Long) => Unit,
            standingStore: Option[String] = None,
            compactEvery: Int = 8): StreamingQuery = {
    require(compactEvery > 0, s"compactEvery must be positive: $compactEvery")
    require(delta.columns.contains("doc_id") && delta.columns.contains("url"),
      s"delta must carry (doc_id, url); has ${delta.columns.mkString(", ")}")
    // fail fast on the names this gate computes/consumes (Salting's
    // reserved-name rule, r19 review): a passthrough named norm_url —
    // plausible, since d92's output shape IS (norm_url, ...) — would be
    // silently overwritten with the recomputed key, and __rn silently
    // consumed by the keeper window
    for (reserved <- Seq("norm_url", "__rn"))
      require(!delta.columns.contains(reserved),
        s"delta already carries $reserved — rename it first (the gate " +
          "computes this column)")
    require(base.columns.contains("norm_url"),
      s"base must carry norm_url (d92's output shape); has " +
        base.columns.mkString(", "))
    // the order-sensitive store protocol (restore adjudication, union
    // re-checkpoint cadence, sink-before-append, compaction) lives in
    // the shared skeleton (r19) — this gate supplies only its rule
    StandingGate.start(delta, base.select(col("norm_url")), queryName,
        sink, standingStore, compactEvery,
        storeCols = Seq("norm_url"), dedupKey = "norm_url") {
      (batch, standing, _) =>
        val withKey = DeterministicSurvivor
          .keepFirstBy(batch, "doc_id", "url")
          .withColumn("norm_url", GroupC.urlNormalize(col("url")))
        val refused = withKey.filter(col("norm_url").isNull)
        val keyed = withKey.filter(col("norm_url").isNotNull)
        // d92's keeper rule within the batch: smallest doc_id per
        // canonical URL (row_number ≤ 1 ⇒ WindowGroupLimit — map-side
        // top-1 per key before the exchange)
        val w = Window.partitionBy(col("norm_url")).orderBy(col("doc_id"))
        val batchKeepers = keyed
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        // cross-batch first-arrival-wins: one anti join against the
        // standing key set
        val fresh = batchKeepers
          .join(standing, Seq("norm_url"), "left_anti")
        val kept = fresh.unionByName(refused).localCheckpoint(true)
        (kept, kept.filter(col("norm_url").isNotNull).select("norm_url"))
    }
  }
}
