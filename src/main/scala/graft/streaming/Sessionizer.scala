package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * escape hatch for per-key logic `session_window` can't express (e.g.
  * per-session aggregates with custom close rules). State per key is one
  * open session (O(1)).
  *
  * This implementation targets BATCH mode (each group runs once, so the
  * trailing open session is emitted at the end), which is how the unit
  * test checks the session arithmetic against the declarative
  * `session_window` operator. A continuous-streaming deployment must NOT
  * emit the open session per micro-batch: it would wire
  * `GroupStateTimeout.EventTimeTimeout` + `state.setTimeoutTimestamp`,
  * emit a session only when its timeout fires, and let the watermark
  * expire idle keys so the state store stays bounded by live keys.
  */
object Sessionizer {
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, n: Long, total: Double)
  private final case class Open(start: Long, last: Long, n: Long, total: Double)

  val GapMs: Long = 30 * 60 * 1000L

  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Open]) =>
          // sort within group (bounded per user), fold into sessions
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.value))
          val (closed, open) = sorted.foldLeft(
            (Vector.empty[Session], state.getOption)) {
            case ((done, cur), e) =>
              val t = e.ts.getTime
              cur match {
                case Some(o) if t - o.last <= GapMs =>
                  (done, Some(o.copy(last = t, n = o.n + 1, total = o.total + e.value)))
                case Some(o) =>
                  (done :+ toSession(user, o), Some(Open(t, t, 1, e.value)))
                case None => (done, Some(Open(t, t, 1, e.value)))
              }
          }
          open.foreach(state.update)
          // batch mode: groups are complete, emit the trailing session too
          (closed ++ open.map(toSession(user, _))).iterator
      }
  }

  private def toSession(user: Long, o: Open): Session =
    Session(user, new java.sql.Timestamp(o.start),
      new java.sql.Timestamp(o.last + GapMs), o.n, o.total)
}
