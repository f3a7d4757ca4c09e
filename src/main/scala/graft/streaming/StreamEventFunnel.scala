package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.GroupB

/** One input event for the streaming funnel (b39's row shape). */
final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

/** Open funnel-window state: per-stage event times WITHIN the window.
  * The stage rule is retroactive under out-of-order arrival (a signup
  * arriving late can admit a view that was previously too early), so the
  * window must buffer each funnel stage's times until it closes — the
  * honest state bound is the window's own funnel-event volume, cleared at
  * every close; non-funnel events only bump the count. Epoch millis keep
  * the state encoder flat and the store rows small (Sessionize's rule).
  */
final case class OpenFunnel(
    startMs: Long,
    lastMs: Long,
    nEvents: Long,
    stageTimes: Seq[Seq[Long]])

/** One emitted (closed) funnel window. */
final case class UserFunnel(
    user_id: Long,
    window_start: Timestamp,
    window_end: Timestamp,
    n_events: Long,
    stage_reached: Long,
    t_signup: Option[Timestamp],
    t_view: Option[Timestamp],
    t_click: Option[Timestamp],
    t_purchase: Option[Timestamp])

/** Per-user ROLLING funnel windows over a live event stream — b39's
  * observability twin and the round-12 verdict's last untouched
  * arbitrary-state pattern: [[Sessionize]]'s `flatMapGroupsWithState`
  * gap-window machinery carrying a NEW state shape (per-stage time
  * buffers instead of a session aggregate), evaluated at window close by
  * the SHARED strict-after rule ([[GroupB.funnelTimes]] over
  * [[GroupB.FunnelStages]]) so the stream cannot disagree with the batch
  * funnel about stage semantics — StreamEventFunnelSpec pins per-window
  * equality against [[GroupB.eventFunnelOf]] on the same events.
  *
  * Scale shape: state is partitioned by user_id, one [[OpenFunnel]] row
  * per ACTIVE user bounded by the gap timeout + watermark (dead users
  * flush and leave the store); events stream through without driver
  * involvement; emission is one row per closed window.
  */
object StreamEventFunnel {

  def funnels(spark: SparkSession, events: Dataset[FunnelEvent],
              gapMinutes: Int = 30,
              watermarkDelay: String = "10 minutes"): Dataset[UserFunnel] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    val nStages = GroupB.FunnelStages.length

    def close(userId: Long, w: OpenFunnel): UserFunnel = {
      val times = GroupB.funnelTimes(w.stageTimes)
      def t(i: Int): Option[Timestamp] = times(i).map(new Timestamp(_))
      UserFunnel(userId, new Timestamp(w.startMs), new Timestamp(w.lastMs),
        w.nEvents, times.count(_.isDefined).toLong,
        t(0), t(1), t(2), t(3))
    }

    def fresh(e: FunnelEvent): OpenFunnel =
      add(OpenFunnel(e.ts.getTime, e.ts.getTime, 0L,
        Seq.fill(nStages)(Seq.empty[Long])), e)

    def add(w: OpenFunnel, e: FunnelEvent): OpenFunnel = {
      val t = e.ts.getTime
      val idx = GroupB.FunnelStages.indexOf(e.event_type)
      val st =
        if (idx < 0) w.stageTimes
        else w.stageTimes.updated(idx, w.stageTimes(idx) :+ t)
      OpenFunnel(math.min(w.startMs, t), math.max(w.lastMs, t),
        w.nEvents + 1, st)
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenFunnel, UserFunnel](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[FunnelEvent],
         state: GroupState[OpenFunnel]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            // within-batch order is arrival order, not event order; sort
            // so gap splits are event-time splits (Sessionize's rule);
            // null-ts rows are dropped, not NPE'd (the watermark's late
            // filter keeps them — null comparisons aren't true)
            val evs =
              batch.filter(_.ts != null).toArray.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[UserFunnel]
            evs.foreach { e =>
              open match {
                case Some(w) if e.ts.getTime - w.lastMs <= gapMs =>
                  open = Some(add(w, e))
                case Some(w) =>
                  closed += close(userId, w)
                  open = Some(fresh(e))
                case None =>
                  open = Some(fresh(e))
              }
            }
            open match {
              case Some(w) =>
                state.update(w)
                // clamped above the CURRENT watermark (Sessionize's r18
                // rule): late events are admitted by a lagging watermark
                // but timeouts validate against the current one — an
                // unclamped lastMs + gap below it kills the query
                state.setTimeoutTimestamp(math.max(w.lastMs + gapMs,
                  state.getCurrentWatermarkMs() + 1L))
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
