package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming upsert view: the latest record per key, maintained across
  * micro-batches — the streaming twin of the batch CDC compaction
  * (q120's window-rank-1). State per key is ONE record (the current
  * winner), so state is O(keys) and never grows with volume; each
  * micro-batch emits a key's new snapshot only when that key received
  * rows (append-mode changelog of the upsert view). Ordering is exact
  * integer microseconds with the event id as tie-break — the same total
  * order the batch twin and the DuckDB oracle use.
  */
object StreamLatest {

  case class Rec(user_id: Long, ts: Timestamp, event_id: Long,
      value: Double)
  case class Latest(user_id: Long, us: Long, event_id: Long, value: Double)

  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Per-key fold: keep the (us, event_id)-max record; emit the key's
    * refreshed snapshot for this batch. */
  def upsert(key: Long, rows: Iterator[Rec], state: GroupState[Latest])
      : Iterator[Latest] = {
    if (!rows.hasNext) return Iterator.empty
    var best = state.getOption.orNull
    rows.foreach { r =>
      val c = Latest(key, toUs(r.ts), r.event_id, r.value)
      if (best == null || c.us > best.us ||
          (c.us == best.us && c.event_id > best.event_id))
        best = c
    }
    state.update(best)
    Iterator.single(best)
  }

  private implicit val re = Encoders.product[Rec]
  private implicit val le = Encoders.product[Latest]
  private implicit val ke = Encoders.scalaLong

  private def run(events: DataFrame): Dataset[Latest] =
    events.selectExpr("user_id", "ts", "event_id", "value").as[Rec]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(upsert)

  /** Batch entry (oracle-gated): one snapshot per key over full input. */
  def batch(events: DataFrame): Dataset[Latest] = run(events)

  /** Streaming entry: the same fold; state carries the current winner
    * across micro-batches. */
  def streaming(events: DataFrame): Dataset[Latest] = run(events)
}
