package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel: per-user view → click → purchase stage
  * machine with a per-stage deadline — the streaming twin of the q125
  * batch funnel (same semantics: each stage's timestamp is the FIRST
  * qualifying event strictly after the previous stage and within
  * `deadlineUs`; folding in event-time order makes "first qualifying" ≡
  * the batch query's MIN). State per user is three optional integer-µs
  * timestamps — O(1) per key, carried across micro-batches; each batch
  * a touched user emits their refreshed stage snapshot (append-mode
  * changelog, latest snapshot per user = the funnel position).
  */
object StreamFunnel {

  case class FEvent(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String)
  case class Stages(user_id: Long, t1: Option[Long], t2: Option[Long],
      t3: Option[Long])

  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Per-key fold in event-time order. Deliberately mirrors q125's
    * staged-min SQL: t2 only accepts events with us > t1 (so a click
    * at or before the first view never counts), and within-batch order
    * is (us, event_id) — the oracle's total order. */
  def advance(key: Long, rows: Iterator[FEvent], state: GroupState[Stages],
      deadlineUs: Long): Iterator[Stages] = {
    if (!rows.hasNext) return Iterator.empty
    var st = state.getOption.getOrElse(Stages(key, None, None, None))
    rows.toArray.sortBy(e => (toUs(e.ts), e.event_id)).foreach { e =>
      val us = toUs(e.ts)
      e.event_type match {
        case "view" if st.t1.isEmpty => st = st.copy(t1 = Some(us))
        case "click" if st.t2.isEmpty && st.t1.exists(t =>
          us > t && us <= t + deadlineUs) => st = st.copy(t2 = Some(us))
        case "purchase" if st.t3.isEmpty && st.t2.exists(t =>
          us > t && us <= t + deadlineUs) => st = st.copy(t3 = Some(us))
        case _ => ()
      }
    }
    state.update(st)
    Iterator.single(st)
  }

  private implicit val ee = Encoders.product[FEvent]
  private implicit val se = Encoders.product[Stages]
  private implicit val ke = Encoders.scalaLong

  private def run(events: DataFrame, deadlineUs: Long): Dataset[Stages] =
    events.selectExpr("user_id", "ts", "event_id", "event_type").as[FEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (k: Long, rows: Iterator[FEvent], st: GroupState[Stages]) =>
          advance(k, rows, st, deadlineUs))

  /** Batch entry (oracle-gated through q142): one stage row per user. */
  def batch(events: DataFrame, deadlineUs: Long): Dataset[Stages] =
    run(events, deadlineUs)

  /** Streaming entry: same fold, state crosses micro-batches. */
  def streaming(events: DataFrame, deadlineUs: Long): Dataset[Stages] =
    run(events, deadlineUs)
}
