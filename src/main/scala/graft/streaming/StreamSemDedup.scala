package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SEMANTIC near-duplicate gate — the keyed-state twin of
  * [[graft.operators.Similarity.semDedup]], completing the dedup
  * matrix: batch lexical (`Dedup.minhashLsh`), batch semantic
  * (`Similarity.semDedup`), streaming lexical ([[StreamNearDup]]),
  * and now streaming semantic. Documents arrive with embeddings; a
  * document whose vector lands within `threshold` cosine of an
  * EARLIER arrival sharing one of its `nassign` nearest quantizer
  * cells is reported as a removal with its recorded keeper — the
  * ingest-time paraphrase/re-render gate that [[StreamNearDup]]'s
  * lexical signatures cannot see.
  *
  * Shape (the [[StreamNearDup]] recipe transposed to embedding
  * space): cell assignment is computed PER ROW against a driver-fit
  * codebook (stateless — no shuffle before the keyed state; the
  * codebook is the same bounded-sample LocalKMeans fit as the batch
  * operator's, passed in as literals because a stream cannot be
  * sampled), then `flatMapGroupsWithState` keyed by cell id holds the
  * first `cellCap` arrivals' (id, vector) per cell — O(cellCap · dim)
  * state per key, RocksDB-compatible — and each arrival compares
  * against the stored entries in arrival order. A pair that shares
  * SEVERAL of its nassign cells is emitted exactly once: only the key
  * equal to the pair's LOWEST shared cell id reports it, computable
  * locally from the two cell lists with zero cross-key coordination
  * (the [[StreamNearDup]] first-agreeing-band trick). A removed
  * document may still match DIFFERENT keepers in its other cells (≤
  * nassign − 1 extra rows); the batch twin collapses those to the
  * min-keeper row, and a streaming consumer treats any row as "drop".
  *
  * Keep-rule deviation from batch semDedup, documented: the batch
  * operator's keeper priority is global distance-to-centroid (the
  * SemDeDup paper's informativeness rule); an ingest gate cannot
  * rank against arrivals it has not seen, so priority here is ARRIVAL
  * order (first seen wins — the same deviation [[StreamDedup]] makes
  * from batch min-id exact dedup). Stored entries serve as keepers
  * whether or not they were themselves removed, exactly like batch
  * semDedup's cap-ranked keepers (chains — A removes B removes C —
  * are possible in both; the first arrival of every connected
  * component always survives). The cosine math is bit-identical to
  * the batch operator's: the same sequential-order dot product
  * ([[graft.functions.VectorDot]] semantics), the same
  * `round(·, 6)` HALF_UP quantization, spec-pinned.
  *
  * At 100 TB: state is (cells seen) × cellCap × dim floats,
  * key-partitioned across executors; `nlist` scales with the corpus
  * exactly like the batch operator's, and production deploys set a
  * TTL (re-crawl horizon) via GroupStateTimeout — kept explicit here,
  * same policy note as [[StreamDedup]].
  *
  * Cap/emission interaction, documented: the exactly-once rule emits a
  * pair only at its MIN shared cell, and under `cellCap` pressure the
  * earlier doc may have been capped out of that specific cell while
  * still enrolled in another shared cell — such a pair is missed even
  * though a stored match exists elsewhere. The miss requires the min
  * shared cell to have filled before the earlier doc arrived AND every
  * other shared cell to either be capped too or rank above the min —
  * a recall (not correctness) trade, covered by the q188 recall gate.
  *
  * Unlike [[StreamNearDup]]'s buckets, IVF cells are coarse Voronoi
  * regions: DISSIMILAR documents legitimately share a cell, so a
  * clique-saturated cell starves the enrollment of unrelated dup pairs
  * inside it. The StreamCapProbe curve (SCALE.md round 11, one-cell
  * worst case, empirical truth) measured removal recall 0.83 / 0.87 /
  * 0.93 / 0.98 / 1.00 at cellCap 250 / 500 / 1000 / 2000 / 4000 under
  * a 3,000-vector saturating clique — the `cellCap = 1000` default
  * holds ≥ 0.93 even there. Production sizing: cellCap ≥ the expected
  * per-cell duplicate mass, and prefer growing `nlist` (more, smaller
  * cells) over growing the cap — cells PARTITION the contention, the
  * cap only bounds it.
  * and measured against cap pressure in SCALE.md's cap-recall table.
  * Replayed ids do NOT consume cap slots: enrollment is skipped when
  * the arrival's vec_id is already stored in the cell. */
object StreamSemDedup {

  case class EmbDoc(vec_id: Long, embedding: Array[Float])
  case class CellRow(cell: Int, vec_id: Long, vec: Array[Float],
      cells: Array[Int])
  case class CellState(ids: Array[Long], vecs: Array[Array[Float]],
      cellLists: Array[Array[Int]])
  case class Removal(vec_id: Long, keeper: Long, cos_sim: Double)
  /** Internal gate output: removal rows (`is_rem`) interleaved with
    * one per-(cell, micro-batch) saturation summary row (emitted only
    * under cap pressure — see [[StreamNearDup.GateOut]]). */
  private[streaming] case class RemOut(vec_id: Long, keeper: Long,
      cos_sim: Double, is_rem: Boolean, enroll_rejected: Long,
      at_cap: Long)

  /** Sequential-order dot product — bit-identical to the batch
    * pipeline's codegen'd VectorDot (per-element cast to double,
    * accumulate in index order). */
  private def dotFF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def dotFD(a: Array[Float], c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * c(i); i += 1 }
    s
  }

  /** Spark `round(x, 6)`: BigDecimal HALF_UP on the double's shortest
    * decimal repr — the same quantization the batch operator applies
    * before its threshold compare. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The `nassign` nearest cells of `v`, by the batch operator's
    * expansion ‖v‖² − 2·v·c + ‖c‖² with (distance, cell) ordering —
    * the same association order as `sortedCellStructs`, so stream and
    * batch agree on cell lists bit-for-bit. */
  def cellsOf(v: Array[Float], centroids: Array[Array[Double]],
      centNorm2: Array[Double], nassign: Int): Array[Int] = {
    val vv = dotFF(v, v)
    val ds = Array.tabulate(centroids.length)(i =>
      (vv - 2.0 * dotFD(v, centroids(i)) + centNorm2(i), i))
    ds.sortBy(identity).take(math.max(1, nassign)).map(_._2)
  }

  /** Lowest cell id the two lists share, or -1 — the exactly-once
    * emission key for a pair (both sides can compute it locally). */
  private def minSharedCell(a: Array[Int], b: Array[Int]): Int = {
    var best = Int.MaxValue
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        if (a(i) == b(j) && a(i) < best) best = a(i)
        j += 1
      }
      i += 1
    }
    if (best == Int.MaxValue) -1 else best
  }

  private def cellRowsOf(d: EmbDoc, centroids: Array[Array[Double]],
      centNorm2: Array[Double], nassign: Int): Iterator[CellRow] = {
    if (d.embedding == null || d.embedding.isEmpty) return Iterator.empty
    if (dotFF(d.embedding, d.embedding) == 0.0) return Iterator.empty
    val cells = cellsOf(d.embedding, centroids, centNorm2, nassign)
    cells.iterator.map(c => CellRow(c, d.vec_id, d.embedding, cells))
  }

  /** Keyed gate: this batch's arrivals (sorted by vec_id — the batch
    * twin's total order) compare against stored entries and earlier
    * same-batch arrivals; the first `cellCap` arrivals are stored. */
  private[streaming] def gate(threshold: Double, cellCap: Int)(
      key: Int, rows: Iterator[CellRow],
      state: GroupState[CellState]): Iterator[RemOut] = {
    val arrivals = rows.toArray.sortBy(_.vec_id)
    // lake-seeded runs can invoke state-only keys (initial state, no
    // batch data): nothing to compare, nothing to report
    if (arrivals.isEmpty) return Iterator.empty
    val st = state.getOption.getOrElse(
      CellState(Array.empty, Array.empty, Array.empty))
    var ids = st.ids; var vecs = st.vecs; var cl = st.cellLists
    // stored-id set, built once per (key, micro-batch) and amortized
    // over every arrival — the per-arrival ids.contains scan was an
    // extra O(cap) pass on hot cells
    val seen = scala.collection.mutable.HashSet.empty[Long]
    ids.foreach(seen += _)
    var rejected = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[RemOut]
    arrivals.foreach { row =>
      val rn = math.sqrt(dotFF(row.vec, row.vec))
      var i = 0
      var emitted = false
      while (!emitted && i < ids.length) {
        if (ids(i) != row.vec_id &&
            minSharedCell(row.cells, cl(i)) == key) {
          val cos = round6(dotFF(row.vec, vecs(i)) /
            (rn * math.sqrt(dotFF(vecs(i), vecs(i)))))
          if (cos >= threshold) {
            out += RemOut(row.vec_id, ids(i), cos, is_rem = true, 0L, 0L)
            emitted = true // first stored match = earliest arrival wins
          }
        }
        i += 1
      }
      // replay guard: an id already stored in this cell (duplicate or
      // re-delivered doc) must not consume another cap slot — without
      // this, replays crowd novel enrollments out of the cap. NOTE the
      // guard only protects the CAP, not the emission: a replayed doc
      // still compares against all stored partners and can re-emit its
      // removal — the gate is at-least-once under re-delivery, which
      // downstream consumers must absorb (removal sets are idempotent
      // under distinct, the intended consumption).
      if (!seen.contains(row.vec_id)) {
        if (ids.length < cellCap) {
          ids = ids :+ row.vec_id
          vecs = vecs :+ row.vec
          cl = cl :+ row.cells
          seen += row.vec_id
        } else rejected += 1L // novel arrival denied a cap slot
      }
    }
    if (ids.length != st.ids.length) state.update(CellState(ids, vecs, cl))
    val atCap = if (ids.length >= cellCap) 1L else 0L
    if (rejected > 0L || atCap > 0L)
      out += RemOut(-1L, -1L, 0.0, is_rem = false, rejected, atCap)
    out.iterator
  }

  /** Fit the quantizer codebook the way the batch operator does: a
    * bounded seeded-hash-ordered sample (the unbiased
    * [[graft.operators.Similarity.codebookSample]] draw) through
    * LocalKMeans. Returns (centroids, per-centroid squared norms
    * computed in the same order the cell expansion uses). */
  def fitCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long = 42L, sampleRows: Int = 4096)
      : (Array[Array[Double]], Array[Double]) = {
    val sample = graft.operators.Similarity.codebookSample(
      corpus, idCol, vecCol, sampleRows)
    require(sample.nonEmpty, "StreamSemDedup needs a non-empty corpus")
    val cents = graft.operators.LocalKMeans.fit(sample, nlist, seed)._2
    (cents, cents.map(c => c.map(x => x * x).sum))
  }

  private def rawStream(docs: Dataset[EmbDoc],
      centroids: Array[Array[Double]], threshold: Double, nassign: Int,
      cellCap: Int): Dataset[RemOut] = {
    import docs.sparkSession.implicits._
    val centNorm2 = centroids.map(c => c.map(x => x * x).sum)
    docs.flatMap(cellRowsOf(_, centroids, centNorm2, nassign))
      .groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(gate(threshold, cellCap))
  }

  private def removalsOf(raw: Dataset[RemOut]): Dataset[Removal] = {
    import raw.sparkSession.implicits._
    raw.toDF().where(col("is_rem"))
      .select(col("vec_id"), col("keeper"), col("cos_sim")).as[Removal]
  }

  /** Streaming removal gate over a `Dataset[EmbDoc]` stream against a
    * pre-fit codebook. */
  def streaming(docs: Dataset[EmbDoc], centroids: Array[Array[Double]],
      threshold: Double, nassign: Int = 2, cellCap: Int = 1000)
      : Dataset[Removal] =
    removalsOf(rawStream(docs, centroids, threshold, nassign, cellCap))

  /** [[streaming]] with its keyed state PRE-SEEDED from the semantic
    * lake artifact ([[graft.operators.Similarity.writeSemDedupArtifacts]]'s
    * keeper table + codebook) — the
    * [[StreamNearDup.streamingFromLake]] twin: micro-batch one dedups
    * against the whole admitted corpus' cap-ranked keepers, no
    * history replay. Per cell, the stored entries are the keeper
    * table's rows in PRIORITY (kok) order — exactly the cap-ranked
    * core [[graft.operators.Similarity.semDedupCross]] probes, so the
    * seeded stream's removal rule matches the batch incremental
    * operator's; live arrivals then enroll behind them in arrival
    * order up to `cellCap`, exactly like an unseeded run. Lake
    * members' nassign cell lists are not stored in the artifact and
    * are recomputed against the same codebook at state build (same
    * geometry, deterministic — the exactly-once min-shared-cell rule
    * needs them). `nassign` must match the write. */
  def streamingFromLake(docs: Dataset[EmbDoc],
      centroids: Array[Array[Double]], keepers: DataFrame,
      threshold: Double, nassign: Int = 2, cellCap: Int = 1000)
      : Dataset[Removal] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, collect_list, slice, sort_array, struct}
    require(keepers.columns.toSet == Set("cell", "keeper", "kv", "kn",
      "kok"), "keepers must be a writeSemDedupArtifacts table; got " +
      keepers.columns.mkString(","))
    val centNorm2 = centroids.map(c => c.map(x => x * x).sum)
    val na = math.max(1, nassign)
    val init = keepers
      .groupBy(col("cell"))
      .agg(slice(sort_array(collect_list(struct(col("kok"),
        col("keeper"), col("kv")))), 1, cellCap).as("e"))
      .select(col("cell"), col("e.keeper").as("ids"),
        col("e.kv").as("vecs"))
      .as[(Int, Array[Long], Array[Array[Float]])]
      .groupByKey(_._1)
      .mapValues(r => CellState(r._2, r._3,
        r._3.map(v => cellsOf(v, centroids, centNorm2, na))))
    removalsOf(docs.flatMap(cellRowsOf(_, centroids, centNorm2, na))
      .groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout, init)(gate(threshold, cellCap)))
  }

  /** Batch twin of [[streamingFromLake]] — same typed pipeline and
    * initial state in batch mode, collapsed to one row per removed
    * doc like [[batch]]. */
  def batchFromLake(emb: DataFrame, centroids: Array[Array[Double]],
      keepers: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nassign: Int = 2, cellCap: Int = 1000)
      : DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val typed = emb.select(
      emb(idCol).cast("long").as("vec_id"),
      emb(vecCol).as("embedding")).as[EmbDoc]
    streamingFromLake(typed, centroids, keepers, threshold, nassign,
      cellCap).toDF()
      .groupBy(col("vec_id"))
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.struct(
          col("keeper"), col("cos_sim"))).as("k"))
      .select(col("vec_id"), col("k.keeper").as("keeper"),
        col("k.cos_sim").as("cos_sim"))
  }

  /** [[streaming]] with SATURATION OBSERVABILITY — the
    * [[StreamNearDup.streamingObserved]] twin: per-micro-batch
    * `enroll_rejected` (novel arrivals denied a cap slot) and
    * `cells_at_cap` (at-cap cells touched) published via
    * `StreamingQueryProgress.observedMetrics(metricsName)`. For THIS
    * gate the signal is load-bearing, not just informative: IVF cells
    * are coarse Voronoi regions, so a clique-saturated cell starves
    * unrelated dup pairs inside it (the StreamCapProbe recall curve —
    * 0.83 at cap 250 under a one-cell hot clique). A rising
    * enroll_rejected on a progress dashboard is the cue to grow
    * `nlist` (partition the contention) before recall decays; a
    * uniform stream holds both metrics at exactly 0. */
  def streamingObserved(docs: Dataset[EmbDoc],
      centroids: Array[Array[Double]], threshold: Double,
      metricsName: String = "graft_semdedup_gate", nassign: Int = 2,
      cellCap: Int = 1000): Dataset[Removal] = {
    import org.apache.spark.sql.functions.{coalesce, lit, sum, when}
    removalsOf(rawStream(docs, centroids, threshold, nassign, cellCap)
      .observe(metricsName,
        coalesce(sum(when(!col("is_rem"), col("enroll_rejected"))),
          lit(0L)).as("enroll_rejected"),
        coalesce(sum(when(!col("is_rem"), col("at_cap"))),
          lit(0L)).as("cells_at_cap")))
  }

  /** Batch twin — the SAME typed pipeline and gate in batch mode,
    * collapsed to one row per removed doc (min keeper id, its cosine;
    * deterministic because batch arrival order is vec_id order). */
  def batch(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16, nassign: Int = 2,
      seed: Long = 42L, cellCap: Int = 1000,
      sampleRows: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (centroids, _) = fitCodebook(emb, idCol, vecCol, nlist, seed,
      sampleRows)
    val typed = emb.select(
      emb(idCol).cast("long").as("vec_id"),
      emb(vecCol).as("embedding")).as[EmbDoc]
    streaming(typed, centroids, threshold, nassign, cellCap).toDF()
      .groupBy(col("vec_id"))
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.struct(
          col("keeper"), col("cos_sim"))).as("k"))
      .select(col("vec_id"), col("k.keeper").as("keeper"),
        col("k.cos_sim").as("cos_sim"))
  }
}
