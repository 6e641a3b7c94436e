package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * escape hatch for per-key logic `session_window` can't express (e.g.
  * per-session aggregates with custom close rules). State per key is one
  * open session (O(1)).
  *
  * Two variants share the fold:
  *  - [[sessionize]] targets BATCH mode (each group runs once, so the
  *    trailing open session is emitted at the end) — how the unit test
  *    checks the session arithmetic against the declarative
  *    `session_window` operator.
  *  - [[sessionizeStream]] is the production continuous-streaming mode:
  *    `GroupStateTimeout.EventTimeTimeout` + `state.setTimeoutTimestamp`
  *    hold the open session in the state store and emit it only when the
  *    event-time watermark passes its close time (last event + gap), so
  *    nothing is emitted per micro-batch prematurely and expired keys
  *    leave the store — state stays bounded by live keys.
  */
object Sessionizer {
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, n: Long, total: Double)
  // public: the streaming state-store encoder codegen needs constructor
  // access (batch mode never serializes state, so private worked there).
  // totalScaled holds the session's value sum in 1e-4 quanta: long
  // addition is associative, so the merged total is independent of the
  // TreeMap merge order (a Double accumulator is not — FP addition
  // reorders under shuffle).
  final case class Open(start: Long, last: Long, n: Long, totalScaled: Long)

  val GapMs: Long = 30 * 60 * 1000L

  /** A value in 1e-4 quanta — the DECIMAL(18,4) convention every oracle
    * sum in this repo uses (graft.Dets.dsum): HALF_UP on the exact binary
    * expansion, identical to Spark's double→decimal(18,4) cast.
    */
  private def scaled(v: Double): Long =
    new java.math.BigDecimal(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Fold an event batch into (closed sessions, open session), resuming
    * from prior state — shared by the batch and streaming modes.
    *
    * ORDER-INDEPENDENT interval merge, not sort-then-fold: each event is
    * the interval [t, t+gap); disjoint session intervals live in a
    * TreeMap keyed by start, and an arriving event joins its floor
    * session (t within gap of its last), absorbs any successor sessions
    * it now bridges, or opens a new one — O(log S) per event. This
    * bounds a HOT KEY's memory at Θ(live sessions), the information-
    * theoretic floor (the output is that large), instead of the previous
    * sort's Θ(events in the batch): sessionization is a union of
    * intervals, so no order needs reconstructing. Aggregates are
    * ASSOCIATIVE sums — n as a long, total as the scaled long (see
    * [[Open]]; a Double accumulator would drift with merge order) — so
    * the result is bit-identical to the sorted fold: ScaleOpsSpec pins
    * equivalence against `session_window` including the decimal total,
    * and a shuffled-input spec pins order independence on FP-inexact
    * values.
    */
  private def foldSessions(user: Long, evs: Iterator[Ev],
                           prior: Option[Open]): (Vector[Session], Option[Open]) = {
    val m = new java.util.TreeMap[Long, Open]()
    prior.foreach(o => m.put(o.start, o))
    evs.foreach { e =>
      var cur = Open(e.ts.getTime, e.ts.getTime, 1, scaled(e.value))
      val p = m.floorEntry(cur.start)
      if (p != null && cur.start - p.getValue.last <= GapMs) {
        val po = p.getValue
        m.remove(p.getKey)
        cur = Open(po.start, math.max(po.last, cur.last), po.n + cur.n,
          po.totalScaled + cur.totalScaled)
      }
      var s = m.ceilingEntry(cur.start)
      while (s != null && s.getValue.start - cur.last <= GapMs) {
        val so = s.getValue
        m.remove(s.getKey)
        cur = Open(cur.start, math.max(cur.last, so.last), cur.n + so.n,
          cur.totalScaled + so.totalScaled)
        s = m.ceilingEntry(cur.start)
      }
      m.put(cur.start, cur)
    }
    val all = Vector.newBuilder[Open]
    m.values.forEach(o => all += o)
    val sessions = all.result()
    if (sessions.isEmpty) (Vector.empty, None)
    else (sessions.init.map(toSession(user, _)), Some(sessions.last))
  }

  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Open]) =>
          val (closed, open) = foldSessions(user, evs, state.getOption)
          open.foreach(state.update)
          // batch mode: groups are complete, emit the trailing session too
          (closed ++ open.map(toSession(user, _))).iterator
      }
  }

  /** Production streaming mode: open sessions live in the state store and
    * emit when the event-time watermark passes last + gap. Callers set the
    * watermark upstream (`withWatermark("ts", ...)`); the allowed lateness
    * delays session emission by the same amount, the standard trade.
    */
  def sessionizeStream(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's close time: emit + drop
            // the key from the store (bounded state)
            val out = state.getOption.map(toSession(user, _))
            state.remove()
            out.iterator
          } else {
            val (closed, open) = foldSessions(user, evs, state.getOption)
            open.foreach { o =>
              state.update(o)
              // fire when the watermark passes the session close; clamp
              // above the current watermark (a timeout in the past is
              // rejected) so a straggler session emits next micro-batch
              state.setTimeoutTimestamp(
                math.max(o.last + GapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  private def toSession(user: Long, o: Open): Session =
    Session(user, new java.sql.Timestamp(o.start),
      new java.sql.Timestamp(o.last + GapMs), o.n,
      // decimal(·,4) → double exactly as Spark casts it (one rounding);
      // toDouble/1e4 would double-round past 2^53
      java.math.BigDecimal.valueOf(o.totalScaled, 4).doubleValue())
}
