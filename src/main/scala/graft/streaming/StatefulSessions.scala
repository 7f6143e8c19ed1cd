package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * escape hatch for session semantics `session_window` can't express
  * (here: a per-session event cap, demonstrating arbitrary state logic).
  *
  * State is one `OpenSession` per user key — O(keys) state, partitioned by
  * the grouping key, so it scales horizontally and the watermark bounds
  * how long a key's state survives. The same function serves batch
  * (everything closes at the end of the group) and streaming (open
  * sessions persist in state and close on event-time timeout).
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long,
      total: BigDecimal)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total: Double)

  /** Decimal(scale 6) accumulation — the DetAgg discipline — so totals are
    * exact and identical to the engine's aggregate path regardless of the
    * order events arrive in. */
  private def dec(v: Double): BigDecimal = BigDecimal(
    java.math.BigDecimal.valueOf(v).setScale(6,
      java.math.RoundingMode.HALF_UP))

  /** java.sql.Timestamp keeps microseconds in its nanos field, but getTime
    * is millisecond-truncated — state must round-trip full microseconds or
    * session bounds drift from the engine's native timestamps. */
  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def close(user: Long, s: OpenSession, gapUs: Long): ClosedSession =
    ClosedSession(user, fromUs(s.startUs),
      fromUs(s.lastUs + gapUs), s.n, s.total.toDouble)

  /** @param maxEvents sessions are force-closed after this many events —
    *                  the "custom" rule beyond plain gap sessionization */
  def sessionize(user: Long, rows: Iterator[SessionEvent],
      state: GroupState[OpenSession], gapUs: Long, maxEvents: Long,
      emitOpen: Boolean): Iterator[ClosedSession] = {
    if (!rows.hasNext) { // streaming timeout: flush the open session
      val out = state.getOption.map(close(user, _, gapUs))
      state.remove()
      return out.iterator
    }
    val sorted = rows.toArray.sortBy(e => toUs(e.ts))
    var out = List.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = toUs(e.ts)
      cur match {
        case Some(s) if t - s.lastUs <= gapUs && s.n < maxEvents =>
          cur = Some(OpenSession(s.startUs, t, s.n + 1, s.total + dec(e.value)))
        case Some(s) =>
          out ::= close(user, s, gapUs)
          cur = Some(OpenSession(t, t, 1, dec(e.value)))
        case None =>
          cur = Some(OpenSession(t, t, 1, dec(e.value)))
      }
    }
    if (emitOpen) { // batch: nothing arrives later
      cur.foreach(s => out ::= close(user, s, gapUs))
      state.remove()
    } else {
      cur.foreach { s =>
        state.update(s)
        // wake up once the watermark passes the session's gap horizon
        state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
      }
    }
    out.reverseIterator
  }

  /** Batch entry: the full history is present, so every session closes. */
  def batch(events: DataFrame, gapUs: Long = 5 * 60 * 1000000L,
      maxEvents: Long = Long.MaxValue): Dataset[ClosedSession] = {
    implicit val se = Encoders.product[SessionEvent]
    implicit val ce = Encoders.product[ClosedSession]
    implicit val le = Encoders.scalaLong
    implicit val oe = Encoders.product[OpenSession]
    events.selectExpr("user_id", "ts", "value").as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (k, rows, st: GroupState[OpenSession]) =>
          sessionize(k, rows, st, gapUs, maxEvents, emitOpen = true))
  }

  /** Streaming entry: needs `withWatermark("ts", ...)` upstream; open
    * sessions close when the watermark passes last event + gap. */
  def streaming(events: DataFrame, gapUs: Long = 5 * 60 * 1000000L,
      maxEvents: Long = Long.MaxValue): Dataset[ClosedSession] = {
    implicit val se = Encoders.product[SessionEvent]
    implicit val ce = Encoders.product[ClosedSession]
    implicit val le = Encoders.scalaLong
    implicit val oe = Encoders.product[OpenSession]
    events.selectExpr("user_id", "ts", "value").as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (k, rows, st: GroupState[OpenSession]) =>
          sessionize(k, rows, st, gapUs, maxEvents, emitOpen = false))
  }
}
