package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.DetAgg

/** Structured-Streaming layer over the events schema
  * `(event_id, ts, user_id, event_type, value, props)`.
  *
  * The reference is batch-only (SURVEY §2.11); these transforms give the
  * engine its streaming story. Each is written against a plain DataFrame
  * so the SAME code runs in batch (unit-testable, oracle-checkable) and on
  * a `readStream` source — the Structured Streaming contract. Watermarks
  * bound state; aggregations are keyed by (window, event_type) / session,
  * so state partitions by key and scales horizontally.
  */
object StreamOps {

  /** Tumbling-window count + deterministic sum per event_type. On a
    * stream, `withWatermark` bounds the window state to `watermark` of
    * lateness. */
  def tumblingAgg(events: DataFrame, windowLen: String = "1 hour",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.map(events.withWatermark("ts", _)).getOrElse(events)
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), DetAgg.detSum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total"))
  }

  /** Sliding-window mean value per event_type. */
  def slidingAgg(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", watermark: Option[String] = None)
      : DataFrame = {
    val src = watermark.map(events.withWatermark("ts", _)).getOrElse(events)
    src.groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(DetAgg.detAvg(col("value")).as("mean_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("mean_value"))
  }

  /** Per-user session windows with a fixed inactivity gap: native
    * `session_window` keeps the same semantics in batch and streaming
    * (merging state per user key). */
  def sessionAgg(events: DataFrame, gap: String = "5 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.map(events.withWatermark("ts", _)).getOrElse(events)
    src.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), DetAgg.detSum(col("value")).as("total"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"),
        col("n_events"), col("total"))
  }

  /** Stream-stream inner join: each left event matched to right events of
    * the same user within `[left.ts − lookback, left.ts]` — the
    * attribution-join shape (e.g. purchase ← preceding clicks). The
    * event-time bound is what lets Structured Streaming drop state: with
    * watermarks on BOTH sides, a buffered row is released once the other
    * side's watermark passes its join horizon. Same code runs in batch
    * (plain interval equi-join, oracle-checkable). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lookback: String = "10 minutes",
      watermark: Option[String] = None): DataFrame = {
    val l0 = left.select(col(keyCol).as("l_key"), col("ts").as("l_ts"),
      col("event_id").as("l_event_id"))
    val r0 = right.select(col(keyCol).as("r_key"), col("ts").as("r_ts"),
      col("event_id").as("r_event_id"), col("value").as("r_value"))
    val l = watermark.map(l0.withWatermark("l_ts", _)).getOrElse(l0)
    val r = watermark.map(r0.withWatermark("r_ts", _)).getOrElse(r0)
    l.join(r, col("l_key") === col("r_key") &&
      col("r_ts") >= col("l_ts") - expr(s"INTERVAL $lookback") &&
      col("r_ts") <= col("l_ts"))
      .select(col("l_key").as("user_id"), col("l_event_id"), col("l_ts"),
        col("r_event_id"), col("r_ts"), col("r_value"))
  }

  /** Stream–static dimension enrichment: broadcast-join the (bounded)
    * dimension table onto the stream. Stateless — no watermark needed —
    * and the canonical shape for decorating a 100 TB/day event stream
    * with reference data: the dim broadcasts once per micro-batch, the
    * stream never shuffles. (For a LARGE dimension, pre-bucket both
    * sides instead; this helper is the small-dim path.) */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      keyCol: String): DataFrame =
    events.join(broadcast(dim), keyCol)

  /** Streaming dedup keyed by `idCols` with bounded state:
    * `dropDuplicatesWithinWatermark` keeps a key's fingerprint only until
    * the watermark passes it — the streaming twin of the batch exact-dedup
    * operator (unbounded `dropDuplicates` state would OOM a real stream). */
  def dedupStream(events: DataFrame, watermark: String,
      idCols: Seq[String]): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)
}
