package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for stateful sessionization (epoch-micros time). */
case class SessionEvent(user_id: Long, event_id: Long, tus: Long, value: Double)

/** Emitted closed session. */
case class SessionOut(user_id: Long, session_start_us: Long, session_end_us: Long,
                      n_events: Long, sum_value: Double)

private case class SessionState(start: Long, end: Long, n: Long, sum: Double)

/** Custom stateful streaming operator: gap-based sessionization via
  * `flatMapGroupsWithState` — the streaming form of the batch q13
  * (lag + cumsum) query. State per user is one open session; a gap
  * larger than `gapUs` (or timeout) closes and emits it.
  *
  * Scale: state is keyed by user, sharded across executors; per-key
  * state is O(1) (a single open-session summary, not the events).
  */
object Sessionizer {
  val gapUs: Long = 1800L * 1000000L

  private def step(user: Long, events: Iterator[SessionEvent],
                   state: GroupState[SessionState]): Iterator[SessionOut] = {
    var out = List.empty[SessionOut]
    var cur = state.getOption
    // events within a micro-batch are not ordered; sort this group's slice
    for (e <- events.toSeq.sortBy(x => (x.tus, x.event_id))) {
      cur match {
        case Some(st) if e.tus - st.end > gapUs =>
          out ::= SessionOut(user, st.start, st.end, st.n, st.sum)
          cur = Some(SessionState(e.tus, e.tus, 1, e.value))
        case Some(st) =>
          cur = Some(SessionState(st.start, math.max(st.end, e.tus), st.n + 1, st.sum + e.value))
        case None =>
          cur = Some(SessionState(e.tus, e.tus, 1, e.value))
      }
    }
    cur match {
      case Some(st) if state.hasTimedOut =>
        out ::= SessionOut(user, st.start, st.end, st.n, st.sum)
        state.remove()
      case Some(st) => state.update(st)
      case None => if (state.hasTimedOut) state.remove()
    }
    out.reverseIterator
  }

  /** Closed sessions from a stream of events (append mode). NoTimeout:
    * a session closes when a later event proves the gap (a production
    * feed would use EventTimeTimeout + watermark to flush idle users;
    * ProcessingTimeTimeout busy-loops empty micro-batches on a bounded
    * test source).
    */
  def sessions(events: Dataset[SessionEvent])(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** Batch-mode convenience for tests: sessionize a bounded Dataset. */
  def sessionizeBatch(events: Dataset[SessionEvent])(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (user, it) =>
      var out = List.empty[SessionOut]
      var cur: Option[SessionState] = None
      for (e <- it.toSeq.sortBy(x => (x.tus, x.event_id))) {
        cur match {
          case Some(st) if e.tus - st.end > gapUs =>
            out ::= SessionOut(user, st.start, st.end, st.n, st.sum)
            cur = Some(SessionState(e.tus, e.tus, 1, e.value))
          case Some(st) =>
            cur = Some(SessionState(st.start, math.max(st.end, e.tus), st.n + 1, st.sum + e.value))
          case None =>
            cur = Some(SessionState(e.tus, e.tus, 1, e.value))
        }
      }
      cur.foreach(st => out ::= SessionOut(user, st.start, st.end, st.n, st.sum))
      out.reverseIterator
    }
  }
}
