package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Streaming ingest-time benchmark decontamination — the stream twin of
  * `Dedup.contaminatedDocs`: a document enters the corpus sink only if
  * it shares NO `windowLen`-codepoint character window with the
  * evaluation/benchmark set. Production corpora ingest continuously;
  * this is the guard that keeps eval contamination from ever landing,
  * rather than a batch scrub after the fact.
  *
  * Shape: the benchmark side is small BY CONSTRUCTION (same premise as
  * the batch scan's broadcast semi-join), so its 128-bit rolling window
  * hashes collect to a driver set once — bounded by a loud `maxWindows`
  * require, see [[benchWindowSet]] — and ride to executors as a closure
  * over a STATELESS filter: no keyed state, no watermark, and the same
  * `clean` plan runs identically over a batch frame or a `readStream`
  * source (spec-asserted stream == batch, including that a replayed
  * contaminated document is dropped on every arrival). The per-document
  * work is the one O(len) RollingWindowHashes pass.
  *
  * At 100 TB: the filter is embarrassingly parallel and pushes to the
  * ingest edge; refresh the benchmark set by restarting the query. For
  * a bench side too big for an exact driver set, [[cleanBloom]] is the
  * drop-in twin: same stateless plan, constant-size filter, and its
  * false positives only ever DROP extra documents — they never admit a
  * contaminated one. */
object StreamDecon {

  private def hashCol(textCol: String, windowLen: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.RollingWindowHashes(
        org.apache.spark.sql.graftshim.ColumnShim.expression(col(textCol)),
        windowLen))

  /** Driver-side benchmark window-hash set (both 64-bit lanes kept —
    * the full 128-bit equality of the batch scan).
    *
    * `maxWindows` bounds the driver collect: the set is fetched with
    * `limit(maxWindows + 1)` so an oversized bench side fails the
    * require below instead of silently OOMing the driver. The default
    * (2M distinct windows ≈ a few hundred MB as a boxed Set) covers any
    * sanely-sized eval suite; a bench side past it should not ride the
    * driver at all — use [[cleanBloom]] / `Sketches
    * .bloomContaminatedDocs` instead, or raise the cap deliberately. */
  def benchWindowSet(bench: DataFrame, textCol: String,
      windowLen: Int = 50, maxWindows: Int = 2000000): Set[(Long, Long)] = {
    val rows = bench.select(explode(hashCol(textCol, windowLen)).as("w"))
      .select(col("w.h1"), col("w.h2")).distinct()
      .limit(maxWindows + 1).collect()
    require(rows.length <= maxWindows,
      s"bench window set exceeds maxWindows=$maxWindows distinct " +
        "windows — too large for an exact driver-side set. Use " +
        "StreamDecon.cleanBloom / Sketches.bloomContaminatedDocs (bloom " +
        "false positives drop extra docs, never admit one), or raise " +
        "maxWindows deliberately.")
    rows.map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Keep only uncontaminated documents. Stateless — the same plan is
    * valid over batch and streaming frames.
    *
    * Deliberate probe-over-semi-join: the relational alternative
    * (explode the windows, left-anti broadcast join against the bench
    * windows) multiplies every document into `len − windowLen + 1` rows
    * before the join and re-aggregates them back into a per-document
    * verdict — a per-batch join + aggregate in a streaming plan. The
    * set probe keeps the whole operator ONE stateless filter over the
    * already-computed hash array: no row explosion, no shuffle, valid
    * under any output mode. The probe is a native codegen'd expression
    * ([[graft.functions.WindowSetContains]] — the bench set rides as a
    * reference object, the PqEncode recipe), so the filter stays
    * inside whole-stage codegen end to end; the former ScalaUDF form
    * paid converter boundaries and broke the codegen span. */
  def clean(docs: DataFrame, benchSet: Set[(Long, Long)],
      textCol: String, windowLen: Int = 50): DataFrame = {
    val contaminated = org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.WindowSetContains(
        org.apache.spark.sql.graftshim.ColumnShim.expression(
          hashCol(textCol, windowLen)), benchSet))
    docs.where(!contaminated)
  }

  /** Constant-size benchmark filter for a bench side too big for
    * [[benchWindowSet]]'s exact driver set: a bloom filter over one
    * 64-bit hash lane, built distributed (`stat.bloomFilter` runs as a
    * tree aggregate) and shipped to executors as a closure. Size is
    * set by (`expectedItems`, `fpp`), independent of corpus size. */
  def benchBloom(bench: DataFrame, textCol: String, windowLen: Int = 50,
      expectedItems: Long = 100000000L, fpp: Double = 0.001): BloomFilter =
    bench.select(explode(hashCol(textCol, windowLen)).as("w"))
      // one lane keys the filter: lane collisions add immeasurably to
      // fpp, and false NEGATIVES stay impossible (every bench h1 lands)
      .select(col("w.h1").as("w"))
      .stat.bloomFilter("w", expectedItems, fpp)

  /** [[clean]] twin for giant bench sides: same stateless one-filter
    * plan, probing the bloom filter instead of an exact set. A false
    * positive drops a clean document (rate ≈ windows-per-doc × fpp);
    * a contaminated document can never slip through. */
  def cleanBloom(docs: DataFrame, bench: BloomFilter, textCol: String,
      windowLen: Int = 50): DataFrame = {
    val contaminated = org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.BloomWindowsContain(
        org.apache.spark.sql.graftshim.ColumnShim.expression(
          hashCol(textCol, windowLen)), bench))
    docs.where(!contaminated)
  }

  /** Batch twin: train docs that share no window with the bench set. */
  def batch(train: DataFrame, bench: DataFrame, textCol: String,
      windowLen: Int = 50): DataFrame =
    clean(train, benchWindowSet(bench, textCol, windowLen), textCol,
      windowLen)
}
