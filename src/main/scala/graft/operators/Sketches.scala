package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Mergeable-sketch operators — the summaries that make 100 TB answers
  * fit in kilobytes. Both follow the same shape: ONE map-side-combinable
  * aggregate builds the sketch (partials merge associatively, so the
  * shuffle carries sketch bytes, not rows), the tiny result returns to
  * the driver, and per-row probes run against the broadcast sketch with
  * no second shuffle. Built on Spark's own `org.apache.spark.util.sketch`
  * (the codegen'd `count_min_sketch` aggregate and `DataFrameStatFunctions
  * .bloomFilter`), not hand-rolled bit arrays.
  */
object Sketches {

  /** Count–min heavy-hitter audit (Cormode & Muthukrishnan, J.Alg 2005):
    * sketch the full key stream, then check the sketch's point estimates
    * for the EXACT top-k keys against the CMS guarantees — never an
    * undercount, and overcount ≤ slackFrac·N (eps sets the expected
    * bound; `slackFrac` is the gate's hard ceiling, chosen with margin).
    *
    * The exact side is one hash aggregate + distributed top-k; the
    * sketch side is one aggregate whose state is a fixed d×w counter
    * array regardless of cardinality — at 100 TB the exact top-k is the
    * expensive audit you run once, the sketch is what the pipeline keeps.
    * Fixed seed + commutative counter adds make every estimate a
    * constant of the dataset (any partitioning, any merge order), so the
    * gate row is oracle-checkable.
    *
    * @return one row per exact-top-k key: (key, n_true, ok) with
    *         ok = est ∈ [n_true, n_true + slackFrac·N] */
  def cmsHeavyHitterGate(df: DataFrame, keyCol: String, topK: Int = 10,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42,
      slackFrac: Double = 0.002): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketchBytes = df.agg(
      expr(s"count_min_sketch($keyCol, ${eps}D, ${confidence}D, $seed)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new ByteArrayInputStream(sketchBytes))
    val slack = (slackFrac * cms.totalCount()).toLong
    // exact top-k: distributed TakeOrdered, k rows to the driver — the
    // ONLY rows that ever leave the cluster besides the sketch itself
    val top = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("key").asc).limit(topK)
      .collect()
    val rows = top.map { r =>
      val key = r.getLong(0); val n = r.getLong(1)
      val est = cms.estimateCount(java.lang.Long.valueOf(key))
      (key, n, est >= n && est <= n + slack)
    }
    spark.createDataset(rows.toSeq).toDF("key", "n_true", "ok")
  }

  /** Bloom-filter benchmark decontamination — the broadcast-membership
    * scale path of [[Dedup.contaminatedDocs]] (same hashed
    * `windowLen`-char windows). The benchmark side collapses into ONE
    * fixed-size bit array via a mergeable aggregate (`stat.bloomFilter`
    * is a treeAggregate of partial filters), which then rides to every
    * executor as a closure constant: the corpus is probed with a pure
    * per-partition map — NO shuffle of corpus windows, where the exact
    * operator shuffles or broadcasts the full distinct window set. False
    * positives over-flag (cheap: flagged docs get the exact re-check);
    * false negatives are impossible — which is exactly the property the
    * gate asserts.
    *
    * @return flagged corpus docs: (id, n_flagged_windows) */
  def bloomContaminatedDocs(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, windowLen: Int = 50,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    // window sets come from the shared rolling-hash scan (Dedup
    // .windowHashes); the bloom filter keys on one 64-bit lane — the
    // filter is approximate by design (fpp), lane collisions only add
    // immeasurably to fpp, and false NEGATIVES remain impossible
    // (every bench h1 is inserted)
    def windows(df: DataFrame): DataFrame =
      Dedup.windowHashes(df, textCol, idCol, windowLen)
        .select(col("id"), col("w.h1").as("w"))
    val bf = windows(bench).stat.bloomFilter("w", expectedItems, fpp)
    val mightContain = org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.BloomContainsLong(
        org.apache.spark.sql.graftshim.ColumnShim.expression(col("w")), bf))
    windows(train)
      .where(mightContain)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_flagged_windows"))
  }
}
