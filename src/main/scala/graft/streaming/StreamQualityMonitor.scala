package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** A flagged document entering the monitor. */
final case class MonitoredDoc(source: String, n_tokens: Long, keep: Boolean)

/** Cumulative per-source state carried across micro-batches. */
final case class SourceStats(n_docs: Long, n_dropped: Long, n_tokens: Long)

/** One per-source snapshot emitted each batch the source appears in. */
final case class SourceSnapshot(
    source: String,
    batch_docs: Long,
    n_docs: Long,
    n_dropped: Long,
    n_tokens: Long,
    drop_rate_fp: Long)

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
  * never disagree with the gate it watches.
  */
object StreamQualityMonitor {

  /** Attach the monitor to a (source, text, …) stream. */
  def monitor(spark: SparkSession, docs: DataFrame): Dataset[SourceSnapshot] = {
    import spark.implicits._
    StreamFunnel.flagged(docs)
      .select(col("source"), col("__n_tokens").as("n_tokens"),
        col("__keep").as("keep"))
      .as[MonitoredDoc]
      .groupByKey(_.source)
      .mapGroupsWithState[SourceStats, SourceSnapshot](
        GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[MonitoredDoc],
         state: org.apache.spark.sql.streaming.GroupState[SourceStats]) =>
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
          SourceSnapshot(source, batchDocs, next.n_docs, next.n_dropped,
            next.n_tokens,
            if (next.n_docs > 0) next.n_dropped * 10000L / next.n_docs else 0L)
      }
  }
}
