package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming ingest-time benchmark decontamination — the stream twin of
  * `Dedup.contaminatedDocs`: a document enters the corpus sink only if
  * it shares NO `windowLen`-codepoint character window with the
  * evaluation/benchmark set. Production corpora ingest continuously;
  * this is the guard that keeps eval contamination from ever landing,
  * rather than a batch scrub after the fact.
  *
  * Shape: the benchmark side is small BY CONSTRUCTION (same premise as
  * the batch scan's broadcast semi-join), so its 128-bit rolling window
  * hashes collect to a driver set once and ride to executors as a
  * closure over a STATELESS filter — no keyed state, no watermark, and
  * the same `clean` plan runs identically over a batch frame or a
  * `readStream` source (spec-asserted stream == batch, including that a
  * replayed contaminated document is dropped on every arrival). The
  * per-document work is the one O(len) RollingWindowHashes pass.
  *
  * At 100 TB: the filter is embarrassingly parallel and pushes to the
  * ingest edge; refresh the benchmark set by restarting the query (or
  * swap in `Sketches.bloomContaminatedDocs`' filter for a giant bench
  * side — false positives then drop extra docs, never admit one). */
object StreamDecon {

  private def hashCol(textCol: String, windowLen: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.RollingWindowHashes(
        org.apache.spark.sql.graftshim.ColumnShim.expression(col(textCol)),
        windowLen))

  /** Driver-side benchmark window-hash set (both 64-bit lanes kept —
    * the full 128-bit equality of the batch scan). */
  def benchWindowSet(bench: DataFrame, textCol: String,
      windowLen: Int = 50): Set[(Long, Long)] =
    bench.select(explode(hashCol(textCol, windowLen)).as("w"))
      .select(col("w.h1"), col("w.h2")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Keep only uncontaminated documents. Stateless — the same plan is
    * valid over batch and streaming frames. */
  def clean(docs: DataFrame, benchSet: Set[(Long, Long)],
      textCol: String, windowLen: Int = 50): DataFrame = {
    val contaminated = udf((ws: Seq[org.apache.spark.sql.Row]) =>
      ws != null && ws.exists(r =>
        benchSet.contains((r.getLong(0), r.getLong(1)))))
    docs.where(!contaminated(hashCol(textCol, windowLen)))
  }

  /** Batch twin: train docs that share no window with the bench set. */
  def batch(train: DataFrame, bench: DataFrame, textCol: String,
      windowLen: Int = 50): DataFrame =
    clean(train, benchWindowSet(bench, textCol, windowLen), textCol,
      windowLen)
}
