package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** A flagged document entering the monitor. */
final case class MonitoredDoc(source: String, n_tokens: Long, keep: Boolean)

/** [[MonitoredDoc]] plus the event time — the event-time variant's row. */
final case class MonitoredDocTs(source: String, n_tokens: Long,
    keep: Boolean, ts: java.sql.Timestamp)

/** Cumulative per-source state carried across micro-batches. */
final case class SourceStats(n_docs: Long, n_dropped: Long,
    n_tokens: Long, max_ts_ms: Long = 0L)

/** One per-source snapshot emitted each batch the source appears in —
  * or, under an idle timeout, the source's FINAL snapshot (`evicted`
  * true, batch_docs 0) as its state leaves the store.
  */
final case class SourceSnapshot(
    source: String,
    batch_docs: Long,
    n_docs: Long,
    n_dropped: Long,
    n_tokens: Long,
    drop_rate_fp: Long,
    evicted: Boolean)

/** Per-source CUMULATIVE quality monitoring — the live "is a feed going
  * bad" dashboard a crawl ingest runs next to the gate: for every source
  * seen in a micro-batch, emit running totals (docs, gate drops, tokens)
  * and the fixed-point drop rate since stream start. This is the
  * `mapGroupsWithState` shape — unbounded cumulative state that windowed
  * aggregation cannot express (no window ever closes) and
  * `flatMapGroupsWithState`-sessionization doesn't cover (one emission
  * per group per batch, Update mode).
  *
  * Scale shape: state is ONE small [[SourceStats]] row per source (the
  * source cardinality is the operator's honest bound — feeds, not
  * documents), rows stream through executor-side, and the quality flag
  * is [[StreamFunnel.flagged]]'s verbatim projection so the monitor can
  * never disagree with the gate it watches. With `idleTimeout` set
  * (round-13 eviction), a source that stops producing has its state
  * emitted-and-dropped after the processing-time timeout — a DEAD feed
  * no longer holds a state row forever, and a re-arriving source
  * re-accumulates from zero (spec-pinned) — so the state bound becomes
  * ACTIVE sources, tighter than all-sources-ever.
  *
  * Operational note: with the timeout enabled Spark must keep scheduling
  * no-data micro-batches (that is how idle timeouts fire), so run the
  * query with an explicit processing-time trigger sized to the timeout
  * (e.g. timeout/4) — the default as-fast-as-possible trigger busy-loops
  * empty batches, and `processAllAvailable` never observes quiescence.
  */
object StreamQualityMonitor {

  /** One snapshot shape for BOTH timeout variants — extracted so the
    * drop-rate fixed point and eviction row can never drift between
    * them (review finding, round 13).
    */
  private def snapOf(source: String, s: SourceStats, batchDocs: Long,
      evicted: Boolean): SourceSnapshot =
    SourceSnapshot(source, batchDocs, s.n_docs, s.n_dropped, s.n_tokens,
      if (s.n_docs > 0) s.n_dropped * 10000L / s.n_docs else 0L, evicted)

  /** The shared terminal-emit-and-remove eviction step. */
  private def evict(source: String,
      state: org.apache.spark.sql.streaming.GroupState[SourceStats])
      : SourceSnapshot = {
    val last = state.getOption.getOrElse(SourceStats(0L, 0L, 0L))
    state.remove()
    snapOf(source, last, 0L, evicted = true)
  }

  /** Attach the monitor to a (source, text, …) stream; `idleTimeout`
    * (e.g. "30 minutes") enables emit-and-drop eviction of idle sources.
    */
  def monitor(spark: SparkSession, docs: DataFrame,
              idleTimeout: Option[String] = None): Dataset[SourceSnapshot] = {
    import spark.implicits._
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    StreamFunnel.flagged(docs)
      .select(col("source"), col("__n_tokens").as("n_tokens"),
        col("__keep").as("keep"))
      .as[MonitoredDoc]
      .groupByKey(_.source)
      .mapGroupsWithState[SourceStats, SourceSnapshot](timeoutConf) {
        (source: String, batch: Iterator[MonitoredDoc],
         state: org.apache.spark.sql.streaming.GroupState[SourceStats]) =>
          // idle feed: publish the terminal totals and free the row;
          // if the source comes back it starts a fresh accumulation
          if (state.hasTimedOut) evict(source, state)
          else {
            var batchDocs = 0L
            var dropped = 0L
            var tokens = 0L
            batch.foreach { d =>
              batchDocs += 1
              if (!d.keep) dropped += 1
              tokens += d.n_tokens
            }
            val prev = state.getOption.getOrElse(SourceStats(0L, 0L, 0L))
            val next = SourceStats(prev.n_docs + batchDocs,
              prev.n_dropped + dropped, prev.n_tokens + tokens)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            snapOf(source, next, batchDocs, evicted = false)
          }
      }
  }

  /** The EVENT-TIME eviction variant (round 13, closing the last
    * GroupStateTimeout mode): for a (source, text, `tsCol`, …) stream,
    * a source is evicted when the WATERMARK passes its newest event
    * time plus `idleTimeoutMs` — data-driven and replay-deterministic
    * (a reprocessed log evicts at the same batch every run), where the
    * processing-time variant's clock depends on wall time. The timeout
    * timestamp is clamped above the current watermark (a batch of
    * exclusively allowed-late rows could otherwise set one in the
    * past, which Spark rejects). No busy-loop caveat here: no-data
    * batches are scheduled only when the watermark actually advances,
    * so `processAllAvailable` works and the spec needs no sleeps.
    */
  def monitorEventTime(spark: SparkSession, docs: DataFrame, tsCol: String,
      watermarkDelay: String, idleTimeoutMs: Long): Dataset[SourceSnapshot] = {
    import spark.implicits._
    StreamFunnel.flagged(docs)
      // cast BEFORE the watermark: a cast over a watermarked column
      // drops its event-time tag and EventTimeTimeout then refuses
      .withColumn("__mon_ts", col(tsCol).cast("timestamp"))
      .withWatermark("__mon_ts", watermarkDelay)
      .select(col("source"), col("__n_tokens").as("n_tokens"),
        col("__keep").as("keep"), col("__mon_ts").as("ts"))
      .as[MonitoredDocTs]
      .groupByKey(_.source)
      .mapGroupsWithState[SourceStats, SourceSnapshot](
        GroupStateTimeout.EventTimeTimeout) {
        (source: String, batch: Iterator[MonitoredDocTs],
         state: org.apache.spark.sql.streaming.GroupState[SourceStats]) =>
          if (state.hasTimedOut) evict(source, state)
          else {
            var batchDocs = 0L
            var dropped = 0L
            var tokens = 0L
            var maxTs = 0L
            batch.foreach { d =>
              batchDocs += 1
              if (!d.keep) dropped += 1
              tokens += d.n_tokens
              if (d.ts != null && d.ts.getTime > maxTs) maxTs = d.ts.getTime
            }
            val prev = state.getOption.getOrElse(SourceStats(0L, 0L, 0L))
            // the deadline derives from the ALL-TIME newest event, not
            // this batch's: an allowed-late batch must never pull the
            // deadline backward and evict a non-idle source (review
            // finding, round 13) — max_ts_ms is monotone, so the
            // timeout timestamp is too
            val next = SourceStats(prev.n_docs + batchDocs,
              prev.n_dropped + dropped, prev.n_tokens + tokens,
              math.max(prev.max_ts_ms, maxTs))
            state.update(next)
            val wm = state.getCurrentWatermarkMs()
            val base = if (next.max_ts_ms > 0L) next.max_ts_ms else wm
            state.setTimeoutTimestamp(
              math.max(base + idleTimeoutMs, wm + 1L))
            snapOf(source, next, batchDocs, evicted = false)
          }
      }
  }
}
