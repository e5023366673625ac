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

  private def toSession(userId: Long, s: SessionState): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)

  /** The per-key session fold shared VERBATIM by the streaming and batch
    * paths (so "batch ≡ streaming" holds by construction, not by
    * parallel implementations): events extend the open session if within
    * `gapMs` of its bounds, else the open session closes and a new one
    * starts. Returns (closed sessions, still-open state). */
  private[streaming] def foldSessions(gapMs: Long, userId: Long,
      init: Option[SessionState], events: Seq[Event]):
      (Vector[Session], Option[SessionState]) = {
    val out = Vector.newBuilder[Session]
    var cur = init
    events.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        // within gap of the open session's BOUNDS (a late event may
        // precede session start — extend backwards, not just forwards)
        case Some(s) if t >= s.start - gapMs && t <= s.last + gapMs =>
          cur = Some(SessionState(math.min(s.start, t),
            math.max(s.last, t), s.n + 1, s.total + e.value))
        case Some(s) if t > s.last + gapMs =>
          out += toSession(userId, s)
          cur = Some(SessionState(t, t, 1, e.value))
        case Some(_) =>
          // older than start − gap: belongs to an already-closed
          // stretch of history — emit as its own degenerate session
          // rather than corrupting the open one
          out += Session(userId, e.ts, e.ts, 1, e.value)
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    (out.result(), cur)
  }

  /** Per-key session logic for the streaming path: the shared fold plus
    * watermark-timeout flushing of the final open session. */
  def sessionFn(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val last = state.getOption.map(toSession(userId, _))
      state.remove()
      last.iterator
    } else {
      val (closed, open) = foldSessions(gapMs, userId, state.getOption,
        events.toSeq)
      open.foreach { s =>
        state.update(s)
        // finalize when the watermark passes session end + gap
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.iterator
    }
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

  /** Batch sessionize (backfills, and the x20 oracle entry): the SAME
    * fold per key, with the final open session flushed directly — batch
    * has all the data, so "watermark passed" is simply end-of-group.
    * Distributed: one hash shuffle on user_id, then a per-key in-memory
    * sort (a key's event history fits an executor by the same argument
    * that bounds the streaming state). */
  def sessionizeBatch(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val le = Encoders.scalaLong
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      val (closed, open) = foldSessions(gapMs, uid, None, it.toSeq)
      (closed ++ open.map(toSession(uid, _))).iterator
    }
  }
}
