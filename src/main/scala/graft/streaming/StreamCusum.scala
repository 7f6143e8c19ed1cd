package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM change detection — the stateful twin of
  * `Analytics.cusumReport`: the IDENTICAL quantized fold
  * `s' = round6(max(0, s + (x − target)))` runs per key as O(1) keyed
  * state (four numbers), emitting the running report after every
  * micro-batch. A stream cannot revisit history, but CUSUM never needs
  * it — the statistic is a left fold by construction, which is what
  * makes the batch HOF, the recursive-CTE oracle, and this operator
  * provably the same computation (the spec asserts the streaming end
  * state equals the batch report on the same points).
  */
object StreamCusum {

  case class Point(key: String, hr: Timestamp, v: Double)
  case class CusumState(n: Long, s: Double, alarms: Long, maxs: Double)
  case class Report(key: String, n_points: Long, n_alarms: Long,
      max_cusum: Double)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The per-key fold — same association order as the batch aggregate
    * HOF (`(s + v) − target`), same round-before-compare. */
  def fold(key: String, rows: Iterator[Point],
      state: GroupState[CusumState], target: Double,
      threshold: Double): Iterator[Report] = {
    var st = state.getOption.getOrElse(CusumState(0L, 0.0, 0L, 0.0))
    rows.toArray.sortBy(_.hr.getTime).foreach { p =>
      val s2 = r6(math.max(0.0, st.s + p.v - target))
      st = CusumState(st.n + 1, s2,
        st.alarms + (if (s2 > threshold) 1L else 0L),
        math.max(st.maxs, s2))
    }
    state.update(st)
    Iterator.single(Report(key, st.n, st.alarms, st.maxs))
  }

  def streaming(points: Dataset[Point], target: Double,
      threshold: Double): Dataset[Report] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[Point], st: GroupState[CusumState]) =>
          fold(k, it, st, target, threshold)
      }
  }
}
