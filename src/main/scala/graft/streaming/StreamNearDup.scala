package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{coalesce, col, collect_list, lit, slice, sort_array, struct, sum, when}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

/** Streaming NEAR-duplicate detection — the keyed-state twin of
  * `Dedup.minhashLsh`: documents arrive as a stream, and a document
  * whose MinHash signature band-collides with an earlier arrival is
  * reported as a candidate pair with its signature-agreement estimate
  * of Jaccard. This is the ingest gate that catches re-crawls with
  * boilerplate edits (timestamps, ads, typo fixes) which the exact
  * [[StreamDedup]] content-hash gate cannot see.
  *
  * Shape: signatures and band buckets are computed PER ROW in a typed
  * map (stateless — no shuffle before the keyed state), then
  * `flatMapGroupsWithState` keyed by (band, bucket) holds the first
  * `bucketCap` arrivals' (id, signature) per bucket. A new arrival
  * compares against the stored entries — O(bucketCap · numHashes) work,
  * O(bucketCap) state per key, RocksDB-compatible — and pairs are
  * emitted exactly once, in the FIRST band whose signature rows agree
  * (computable locally from the two signatures, so no cross-key
  * distinct is needed). `bucketCap` is the same skew/state guard as
  * the batch operator's: a boilerplate mega-bucket holds its first cap
  * entries and compares later arrivals against them instead of going
  * quadratic (or growing state without bound). The cap is a pure
  * memory/throughput bound, NOT a recall knob: buckets are keyed by
  * the band signature, so distinct dup groups occupy their own buckets
  * and never contend with a hot clique's — the StreamCapProbe curve
  * (SCALE.md round 11) measured removal recall 1.000 at every cap from
  * 250 to 4000 under a 3,000-doc saturating clique with 500 unrelated
  * dup pairs arriving after saturation; only intra-clique pair
  * ATTRIBUTION shifts to the stored prefix, which is what removal
  * consumers want anyway. Hence the default 2000 is sized by state
  * cost (O(cap · bands · sigLen) per hot bucket), not recall.
  *
  * The hash math reproduces the batch pipeline bit-for-bit —
  * `xxhash64(shingle, seed)` per signature position and
  * `xxhash64(array_join(slice(sig, …), ","))` per band bucket, via the
  * same XXH64 kernel Catalyst's expression uses — so stream and batch
  * candidates agree exactly (spec-pinned against the SQL pipeline).
  * Deliberate typed-map-over-Columns: the per-row signature must be
  * STATELESS to precede keyed state (the batch operator's
  * explode + groupBy signature aggregate would itself be a stateful
  * stream op), and the imperative kernel shingles each document once
  * where the higher-order-function form re-runs the split pipeline per
  * seed. One deviation from `minhashLsh`, documented: a pair whose
  * bands merely hash-collide without the underlying signature rows
  * agreeing is dropped (the batch bucket join would emit it by luck) —
  * strictly better precision, identical behavior on true band
  * agreement.
  *
  * At 100 TB: state is (buckets seen) × cap × signature bytes, linear
  * in corpus and key-partitioned across executors; production deploys
  * set a TTL (re-crawl horizon) via GroupStateTimeout — kept explicit
  * here, same policy note as [[StreamDedup]]. */
object StreamNearDup {

  case class Doc(doc_id: Long, text: String)
  case class BandRow(band: Int, bucket: Long, doc_id: Long,
      sig: Array[Long])
  case class BucketState(ids: Array[Long], sigs: Array[Array[Long]])
  case class Cand(a: Long, b: Long, est_jaccard: Double)
  /** Internal gate output: candidate rows (`is_cand`) interleaved with
    * one per-(key, micro-batch) saturation summary row — the summary
    * carries how many NOVEL arrivals were denied a cap slot this batch
    * and whether the bucket sits at cap, and is emitted only when
    * either is non-zero so the healthy path adds zero rows. */
  private[streaming] case class GateOut(a: Long, b: Long,
      est_jaccard: Double, is_cand: Boolean, enroll_rejected: Long,
      at_cap: Long)

  // Catalyst's xxhash64(c1, c2, ...) FOLDS over its children starting
  // from seed 42: hash = XXH64(c1 bytes, 42), then XXH64(c2, hash), ...
  // The batch pipeline's xxhash64(shingle, seed_i) is therefore the
  // chained hashInt(seed_i, XXH64(shingle, 42)) — reproduced here so
  // stream signatures equal batch signatures bit-for-bit (spec-pinned).
  private def xx(s: String, seed: Long): Long = {
    val u = UTF8String.fromString(s)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
  }

  private def xxInt(i: Int, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, seed)

  /** MinHash signature of one document — bit-identical to the batch
    * `min(xxhash64(shingle, seed))` aggregate over distinct word
    * shingles (split on single spaces, empty tokens kept, exactly like
    * `split(text, " ")`). Empty shingle set → None (the batch
    * explode+groupBy drops such docs the same way). */
  def signature(text: String, shingleLen: Int,
      numHashes: Int): Option[Array[Long]] = {
    val words = text.split(" ", -1)
    if (words.length < shingleLen) return None
    val shingles = new scala.collection.mutable.HashSet[String]
    var i = 0
    while (i + shingleLen <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = i + 1
      while (j < i + shingleLen) { sb.append(' ').append(words(j)); j += 1 }
      shingles.add(sb.toString)
      i += 1
    }
    if (shingles.isEmpty) return None
    val sig = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { s =>
      val base = xx(s, 42L) // one byte-pass per shingle
      var k = 0
      while (k < numHashes) {
        val h = xxInt(k, base) // chained per-seed lane, matching batch
        if (h < sig(k)) sig(k) = h
        k += 1
      }
    }
    Some(sig)
  }

  /** Band bucket of signature rows [b·rpb, (b+1)·rpb) — the batch
    * `xxhash64(array_join(slice(sig, …), ","))` (default seed 42). */
  def bandBucket(sig: Array[Long], band: Int, rowsPerBand: Int): Long =
    xx(sig.slice(band * rowsPerBand, (band + 1) * rowsPerBand)
      .mkString(","), 42L)

  private def bandRowsOf(d: Doc, shingleLen: Int, bands: Int,
      rowsPerBand: Int): Iterator[BandRow] =
    signature(d.text, shingleLen, bands * rowsPerBand) match {
      case None => Iterator.empty
      case Some(sig) => (0 until bands).iterator.map(b =>
        BandRow(b, bandBucket(sig, b, rowsPerBand), d.doc_id, sig))
    }

  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** First band (index) whose rows agree between two signatures, or -1.
    * Emitting only in this band makes each pair appear exactly once
    * across the whole band fan-out with zero cross-key coordination. */
  private def firstAgreeingBand(a: Array[Long], b: Array[Long],
      bands: Int, rowsPerBand: Int): Int = {
    var band = 0
    while (band < bands) {
      var r = band * rowsPerBand; var ok = true
      while (ok && r < (band + 1) * rowsPerBand) {
        if (a(r) != b(r)) ok = false; r += 1
      }
      if (ok) return band
      band += 1
    }
    -1
  }

  /** Keyed gate: compare this batch's arrivals (sorted by doc_id — the
    * same total order as the batch twin) against stored entries and
    * each other; store up to `bucketCap` first arrivals. */
  private[streaming] def gate(bands: Int, rowsPerBand: Int,
      minEstJaccard: Double, bucketCap: Int)(
      key: (Int, Long), rows: Iterator[BandRow],
      state: GroupState[BucketState]): Iterator[GateOut] = {
    val arrivals = rows.toArray.sortBy(_.doc_id)
    // lake-seeded runs can invoke state-only keys (initial state, no
    // batch data): nothing to compare, nothing to report
    if (arrivals.isEmpty) return Iterator.empty
    val st = state.getOption.getOrElse(
      BucketState(Array.empty, Array.empty))
    var ids = st.ids; var sigs = st.sigs
    // stored-id set built once per (key, micro-batch) — see
    // StreamSemDedup.gate for why this replaces a per-arrival O(cap)
    // ids.contains scan
    val seen = scala.collection.mutable.HashSet.empty[Long]
    ids.foreach(seen += _)
    var rejected = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[GateOut]
    arrivals.foreach { row =>
      var i = 0
      while (i < ids.length) {
        if (ids(i) != row.doc_id &&
            firstAgreeingBand(sigs(i), row.sig, bands,
              rowsPerBand) == row.band) {
          val est = estJaccard(sigs(i), row.sig)
          if (est >= minEstJaccard)
            out += GateOut(math.min(ids(i), row.doc_id),
              math.max(ids(i), row.doc_id), est, is_cand = true, 0L, 0L)
        }
        i += 1
      }
      // replay guard (same as StreamSemDedup): a re-delivered doc_id
      // already stored in this bucket must not consume a cap slot.
      // Cap-only protection: replays still compare against stored
      // partners and can RE-EMIT candidate pairs — at-least-once under
      // re-delivery; candidates are deduped downstream (distinct on
      // (a, b) before verification), which absorbs it.
      if (!seen.contains(row.doc_id)) {
        if (ids.length < bucketCap) {
          ids = ids :+ row.doc_id
          sigs = sigs :+ row.sig
          seen += row.doc_id
        } else rejected += 1L // novel arrival denied a cap slot
      }
    }
    if (ids.length != st.ids.length) state.update(BucketState(ids, sigs))
    val atCap = if (ids.length >= bucketCap) 1L else 0L
    if (rejected > 0L || atCap > 0L)
      out += GateOut(-1L, -1L, 0.0, is_cand = false, rejected, atCap)
    out.iterator
  }

  private def rawStream(docs: Dataset[Doc], shingleLen: Int, bands: Int,
      rowsPerBand: Int, minEstJaccard: Double,
      bucketCap: Int): Dataset[GateOut] = {
    import docs.sparkSession.implicits._
    docs.flatMap(bandRowsOf(_, shingleLen, bands, rowsPerBand))
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        gate(bands, rowsPerBand, minEstJaccard, bucketCap))
  }

  private def candsOf(raw: Dataset[GateOut]): Dataset[Cand] = {
    import raw.sparkSession.implicits._
    raw.toDF().where(col("is_cand"))
      .select(col("a"), col("b"), col("est_jaccard")).as[Cand]
  }

  /** Streaming candidate-pair gate over a `Dataset[Doc]` stream. */
  def streaming(docs: Dataset[Doc], shingleLen: Int = 3, bands: Int = 8,
      rowsPerBand: Int = 2, minEstJaccard: Double = 0.5,
      bucketCap: Int = 2000): Dataset[Cand] =
    candsOf(rawStream(docs, shingleLen, bands, rowsPerBand,
      minEstJaccard, bucketCap))

  /** [[streaming]] with its keyed state PRE-SEEDED from the batch
    * lake artifact ([[graft.operators.Dedup.writeBandedSignatures]]'s
    * table) — the production ingest edge: a new crawl stream dedups
    * against the ENTIRE admitted corpus from micro-batch one, without
    * replaying a byte of history through the stream. The artifact
    * rows are grouped into per-(band, bucket) initial `BucketState`
    * (first `bucketCap` by id — the same deterministic enroll rule
    * the gate itself applies, so a cap-truncated lake table and a
    * raw one seed identically), handed to Spark's
    * `flatMapGroupsWithState(initialState=…)`; the gate function is
    * UNCHANGED — lake members are simply prior arrivals, compared
    * and stored exactly like live ones. State size is the lake's
    * banded-signature mass, key-partitioned across executors —
    * identical to what the same corpus streamed through the gate
    * would have built, reached in zero stream time. Parameters must
    * match the artifact's write (a mismatch probes nothing). */
  def streamingFromLake(docs: Dataset[Doc], lakeSigs: DataFrame,
      shingleLen: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      minEstJaccard: Double = 0.5, bucketCap: Int = 2000)
      : Dataset[Cand] = {
    import docs.sparkSession.implicits._
    require(lakeSigs.columns.toSet == Set("id", "sig", "band", "bucket"),
      "lakeSigs must be a writeBandedSignatures table " +
        s"(id, sig, band, bucket); got ${lakeSigs.columns.mkString(",")}")
    val init = lakeSigs
      .groupBy(col("band"), col("bucket"))
      .agg(slice(sort_array(collect_list(struct(col("id"), col("sig")))),
        1, bucketCap).as("entries"))
      .select(col("band"), col("bucket"),
        col("entries.id").as("ids"), col("entries.sig").as("sigs"))
      .as[(Int, Long, Array[Long], Array[Array[Long]])]
      .groupByKey(r => (r._1, r._2))
      .mapValues(r => BucketState(r._3, r._4))
    candsOf(docs.flatMap(bandRowsOf(_, shingleLen, bands, rowsPerBand))
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout, init)(
        gate(bands, rowsPerBand, minEstJaccard, bucketCap)))
  }

  /** Batch twin of [[streamingFromLake]] — the same typed pipeline
    * and initial state in batch mode (each key sees its arrivals over
    * the lake-seeded state, in doc_id order). */
  def batchFromLake(docs: DataFrame, lakeSigs: DataFrame,
      textCol: String, idCol: String, shingleLen: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2,
      minEstJaccard: Double = 0.5, bucketCap: Int = 2000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs.select(
      docs(idCol).cast("long").as("doc_id"),
      docs(textCol).as("text")).as[Doc]
    streamingFromLake(typed, lakeSigs, shingleLen, bands, rowsPerBand,
      minEstJaccard, bucketCap).toDF()
  }

  /** [[streaming]] with SATURATION OBSERVABILITY: identical gate and
    * output, plus two per-micro-batch metrics published through the
    * engine's own progress channel (`StreamingQueryProgress
    * .observedMetrics(metricsName)` — a `Dataset.observe` aggregate,
    * so it rides the progress listener every production harness
    * already consumes; no side channel, no accumulators):
    *  - `enroll_rejected`: novel arrivals denied a cap slot this batch
    *    (the cap-pressure signal — rising means buckets are saturating
    *    and later dup pairs will attribute to the stored prefix);
    *  - `buckets_at_cap`: at-cap gate keys TOUCHED this batch.
    * Both are exactly 0 on an unsaturated stream (the gate emits
    * summary rows only under pressure, so the healthy path pays
    * nothing). The alert wiring the SCALE.md cap-curve tables call
    * for: recall holds at cap for this gate, but an operator watching
    * enroll_rejected knows WHEN the cap is being exercised. */
  def streamingObserved(docs: Dataset[Doc],
      metricsName: String = "graft_neardup_gate", shingleLen: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2, minEstJaccard: Double = 0.5,
      bucketCap: Int = 2000): Dataset[Cand] = {
    import docs.sparkSession.implicits._
    candsOf(rawStream(docs, shingleLen, bands, rowsPerBand,
        minEstJaccard, bucketCap)
      .observe(metricsName,
        coalesce(sum(when(!col("is_cand"), col("enroll_rejected"))),
          lit(0L)).as("enroll_rejected"),
        coalesce(sum(when(!col("is_cand"), col("at_cap"))),
          lit(0L)).as("buckets_at_cap")))
  }

  /** Batch twin — the SAME typed pipeline and gate run in batch mode
    * (each key sees all its rows with empty prior state, processed in
    * doc_id order, so the result is deterministic and equals the
    * streamed result under any batch split whenever arrival order
    * respects doc_id). */
  def batch(docs: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      minEstJaccard: Double = 0.5, bucketCap: Int = 2000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs.select(
      docs(idCol).cast("long").as("doc_id"),
      docs(textCol).as("text")).as[Doc]
    streaming(typed, shingleLen, bands, rowsPerBand, minEstJaccard,
      bucketCap).toDF()
  }
}
