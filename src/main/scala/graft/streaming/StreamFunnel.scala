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

  /** The gate's per-row flag projection, built from the SHARED rule
    * pieces ([[graft.queries.GroupD.repShingles]]/`repDupFp` and the two
    * thresholds) so the batch pipeline, this gate, and the per-source
    * monitor ([[StreamQualityMonitor]]) cannot drift on the rule — while
    * keeping a stream-safe, barrier-free plan shape of its own (sharing
    * the batch FRAME was measured catastrophic; see the rule's scaladoc).
    */
  def flagged(docs: DataFrame): DataFrame = {
    import graft.queries.GroupD.{RepMinTokens, RepThresholdFp, repShingles, repDupFp}
    docs
      .withColumn("__ts", graft.queries.GroupC.tokens(col("text")))
      .withColumn("__n_tokens", size(col("__ts")).cast("long"))
      .withColumn("__sh",
        when(size(col("__ts")) >= RepMinTokens, repShingles("__ts")))
      .withColumn("__keep", col("__sh").isNotNull &&
        repDupFp(size(col("__sh")).cast("long"),
          size(array_distinct(col("__sh"))).cast("long")) < RepThresholdFp)
      .drop("__ts", "__sh")
  }

  /** Gate a (doc_id, text, …) frame — batch or streaming — emitting only
    * survivors, with (docs_in, docs_out) observed per batch.
    */
  def gateWithMetrics(docs: DataFrame): DataFrame =
    flagged(docs)
      .observe(MetricName,
        count(lit(1)).as("docs_in"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("docs_out"))
      .filter(col("__keep"))
      .drop("__n_tokens", "__keep")
}
