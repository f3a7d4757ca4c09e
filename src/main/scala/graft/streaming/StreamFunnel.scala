package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming funnel metrics — d56's observability twin for a LIVE ingest.
  * The quality gate (d18's duplicate-3-gram rule, exactly d22's stage 1)
  * runs as a stateless per-row projection, and an `observe` node
  * publishes per-micro-batch `docs_in` / `docs_out` counts through
  * `StreamingQueryProgress.observedMetrics` — the zero-cost way to get
  * funnel rows out of a running job: the counts ride the batch's own
  * pass as accumulator-style metrics (no second subscription, no extra
  * action, no state store). Cross-batch stages publish through their own
  * gates (dedup: [[StreamIngestDedup]]); this twin covers the stateless
  * stage, and its per-batch numbers SUM to the batch funnel's gate row
  * because the rule is per-document (spec-pinned).
  */
object StreamFunnel {
  /** The metric name under `observedMetrics`. */
  val MetricName = "gate_funnel"

  /** The gate's per-row flag projection — a DELEGATE to the one shared
    * definition of d18/d22's rule ([[graft.queries.GroupD
    * .repetitionFlags]]), so the batch pipeline, this gate, and the
    * per-source monitor ([[StreamQualityMonitor]]) can never disagree
    * about what "repetitive" means.
    */
  def flagged(docs: DataFrame): DataFrame =
    graft.queries.GroupD.repetitionFlags(docs)

  /** Gate a (doc_id, text, …) frame — batch or streaming — emitting only
    * survivors, with (docs_in, docs_out) observed per batch.
    */
  def gateWithMetrics(docs: DataFrame): DataFrame =
    flagged(docs)
      .observe(MetricName,
        count(lit(1)).as("docs_in"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("docs_out"))
      .filter(col("__keep"))
      .drop("__n_tokens", "__n_shingles", "__n_distinct", "__dup_fp", "__keep")
}
