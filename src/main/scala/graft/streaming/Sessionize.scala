package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for sessionization. */
final case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)

/** Open-session state carried between triggers (epoch millis — plain longs
  * keep the state encoder trivial and the state store rows small).
  */
final case class OpenSession(startMs: Long, lastMs: Long, nEvents: Long)

/** One emitted (closed) session. */
final case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long)

/** Event-time sessionization with custom state — the
  * `flatMapGroupsWithState` pattern for stateful stream processing that
  * windowed aggregation can't express (sessions have data-dependent
  * extents). Scale shape: state is partitioned by user_id (one small
  * [[OpenSession]] row per active user in the state store), events stream
  * through without any driver involvement, and the event-time timeout +
  * watermark bound state size — the properties that keep this runnable on
  * an unbounded 100 TB stream.
  *
  * Semantics: events more than `gap` apart belong to different sessions.
  * Sessions known to be closed (a later event in the same batch already
  * exceeds the gap) are emitted immediately; the trailing open session
  * stays in state and is emitted when the event-time timeout fires (the
  * watermark has passed its gap horizon).
  */
object Sessionize {

  def sessions(spark: SparkSession, events: Dataset[SessionEvent],
               gapMinutes: Int = 30,
               watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent],
         state: GroupState[OpenSession]) =>
          def close(s: OpenSession): UserSession =
            UserSession(userId, new Timestamp(s.startMs),
              new Timestamp(s.lastMs), s.nEvents)

          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the open session's horizon: flush it
            val out = state.getOption.map(close).toSeq
            state.remove()
            out.iterator
          } else {
            // null ts guard (r18 review): a malformed row with ts = null
            // is NOT removed by the watermark's late filter (null
            // comparisons aren't true), and .getTime would NPE the query
            val times =
              batch.filter(_.ts != null).map(_.ts.getTime).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[UserSession]
            times.foreach { t =>
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  open = Some(s.copy(lastMs = math.max(s.lastMs, t),
                    nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed += close(s)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                // clamp above the CURRENT watermark (r18 review — the
                // StreamQualityMonitor discipline): Spark admits late
                // events by a one-batch-LAGGING watermark but validates
                // timeout timestamps against the current one, so an
                // allowed-late event with lastMs + gap below the current
                // watermark would throw and kill the query; the clamp
                // fires the flush at the next trigger instead
                state.setTimeoutTimestamp(math.max(s.lastMs + gapMs,
                  state.getCurrentWatermarkMs() + 1L))
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
