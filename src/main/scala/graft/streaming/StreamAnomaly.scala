package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming anomaly scoring: each event's z-score against its key's
  * RUNNING history — the streaming twin of `WindowOps.anomalyZScore`,
  * with expanding (unbounded-trailing) semantics because a stream cannot
  * revisit its history. State per key is three numbers (n, Σv, Σv²) kept
  * as scale-6 decimals (the DetAgg discipline) — O(keys) state that
  * never grows with volume, exact, and identical to what any batch
  * engine computes over the same event-time order. The batch entry runs
  * the SAME fold and is oracle-checked (q103); the streaming entry is
  * spec-checked equal to batch on in-order input.
  */
object StreamAnomaly {

  case class Point(event_type: String, ts: Timestamp, event_id: Long,
      value: Double)
  case class RunStats(n: Long, s1: BigDecimal, s2: BigDecimal)
  case class Scored(event_id: Long, value: Double, zscore: Option[Double],
      is_anomaly: Option[Long])

  private def dec(v: Double): BigDecimal = BigDecimal(
    java.math.BigDecimal.valueOf(v).setScale(6,
      java.math.RoundingMode.HALF_UP))

  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** The per-key fold: score, then absorb. Mirrors the SQL
    * `(v − s1/n) / sqrt((s2 − s1²/n)/(n−1))` over the rows-before frame,
    * with the same double association order, so batch output hash-matches
    * the DuckDB oracle. */
  def score(key: String, rows: Iterator[Point], state: GroupState[RunStats],
      minPeriods: Long, z: Double): Iterator[Scored] = {
    if (!rows.hasNext) return Iterator.empty
    var st = state.getOption.getOrElse(RunStats(0L, BigDecimal(0), BigDecimal(0)))
    val out = rows.toArray.sortBy(p => (toUs(p.ts), p.event_id)).map { p =>
      val zscore: Option[Double] =
        if (st.n >= minPeriods) {
          val n = st.n.toDouble
          val s1 = st.s1.toDouble; val s2 = st.s2.toDouble
          val variance = (s2 - s1 * s1 / n) / (n - 1)
          if (variance > 0) {
            val raw = (p.value - s1 / n) / math.sqrt(variance)
            Some(BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
          } else None
        } else None
      st = RunStats(st.n + 1, st.s1 + dec(p.value),
        st.s2 + dec(p.value * p.value))
      Scored(p.event_id, p.value, zscore,
        zscore.map(s => if (math.abs(s) > z) 1L else 0L))
    }
    state.update(st)
    out.iterator
  }

  private implicit val pe = Encoders.product[Point]
  private implicit val se = Encoders.product[Scored]
  private implicit val ke = Encoders.STRING
  private implicit val re = Encoders.product[RunStats]

  /** Batch entry (oracle-gated): full history folded in event-time order. */
  def batch(events: DataFrame, minPeriods: Long = 12L, z: Double = 3.0)
      : Dataset[Scored] =
    events.selectExpr("event_type", "ts", "event_id", "value").as[Point]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (k: String, rows: Iterator[Point], st: GroupState[RunStats]) =>
          score(k, rows, st, minPeriods, z))

  /** Streaming entry: state carries (n, Σv, Σv²) across micro-batches;
    * within each batch events are folded in event-time order. */
  def streaming(events: DataFrame, minPeriods: Long = 12L, z: Double = 3.0)
      : Dataset[Scored] =
    events.selectExpr("event_type", "ts", "event_id", "value").as[Point]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (k: String, rows: Iterator[Point], st: GroupState[RunStats]) =>
          score(k, rows, st, minPeriods, z))
}
