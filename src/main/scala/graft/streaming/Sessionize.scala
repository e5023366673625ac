package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful stream processing beyond the reference's file-trigger model:
  * gap-based sessionization of an event stream with
  * `flatMapGroupsWithState` — the canonical custom-state shape
  * (per-key state + event-time timeout) that windowed aggregation can't
  * express.
  *
  * Scale: state is partitioned by user key across executors; the
  * watermark bounds state size (sessions older than watermark − gap are
  * finalized and evicted by timeout), so state stays O(active users),
  * not O(history). The same function also runs in batch mode
  * (`Dataset.groupByKey.flatMapGroupsWithState`) for backfills.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           total_value: Double)

  /** Per-key session logic: events extend the open session if within
    * `gapMs` of its last event, else the open session closes and a new
    * one starts. On event-time timeout the final open session flushes. */
  def sessionFn(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    val out = scala.collection.mutable.ArrayBuffer[Session]()

    def close(s: SessionState): Unit =
      out += Session(userId, new Timestamp(s.start), new Timestamp(s.last),
        s.n, s.total)

    if (state.hasTimedOut) {
      state.getOption.foreach(close)
      state.remove()
    } else {
      var cur = state.getOption
      events.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur match {
          // within gap of the open session's BOUNDS (a late event may
          // precede session start — extend backwards, not just forwards)
          case Some(s) if t >= s.start - gapMs && t <= s.last + gapMs =>
            cur = Some(SessionState(math.min(s.start, t),
              math.max(s.last, t), s.n + 1, s.total + e.value))
          case Some(s) if t > s.last + gapMs =>
            close(s)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            // older than start − gap: belongs to an already-closed
            // stretch of history — emit as its own degenerate session
            // rather than corrupting the open one
            out += Session(userId, e.ts, e.ts, 1, e.value)
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // finalize when the watermark passes session end + gap
        state.setTimeoutTimestamp(s.last + gapMs)
      }
    }
    out.iterator
  }

  /** Streaming sessionize: requires a watermark on `ts` upstream. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val sse = Encoders.product[SessionState]
    implicit val le = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionFn(gapMs))
  }
}
