package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-seen deduplication — the keyed-state twin of the
  * batch "keep the first event per key" query: a key's FIRST arrival
  * passes through, every later duplicate is dropped with O(1) state per
  * key (one (ts, event_id) pair — not a buffer of rows). This is the
  * streaming ingest gate a training-data pipeline puts in front of a
  * corpus sink so re-crawled/replayed items never land twice.
  *
  * Semantics: within a micro-batch, ties resolve by event time then id
  * (same total order as the batch twin); ACROSS batches the first
  * arrival wins, so the streaming result equals the batch result
  * whenever arrival order respects event time (the spec asserts both
  * the equality on ordered input and the drop behavior on replays).
  * Unbounded key sets would grow state forever — production use sets a
  * state TTL via GroupStateTimeout or bounds the key domain; kept
  * explicit here rather than hidden behind a default.
  */
object StreamDedup {

  case class Ev(user_id: Long, event_type: String, event_id: Long,
      ts: Timestamp, value: Double)
  case class Seen(event_id: Long, us: Long)

  /** Batch twin: first event per (user_id, event_type) by (ts, id). */
  def batch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), col("value"))
  }

  /** Emit a key's first arrival, drop the rest; state is one Seen. */
  def gate(key: (Long, String), rows: Iterator[Ev],
      state: GroupState[Seen]): Iterator[Ev] = {
    if (state.exists) { Iterator.empty }
    else {
      val first = rows.reduceLeft { (a, b) =>
        val at = a.ts.getTime; val bt = b.ts.getTime
        if (at < bt || (at == bt && a.event_id <= b.event_id)) a else b
      }
      state.update(Seen(first.event_id, first.ts.getTime))
      Iterator.single(first)
    }
  }

  def streaming(events: Dataset[Ev]): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(gate)
  }
}
