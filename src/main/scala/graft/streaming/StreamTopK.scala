package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.{TopKAgg, TopKBuffer}

/** Streaming per-key top-k — the keyed-state twin of [[TopKAgg]]: the
  * SAME bounded heap runs as mapGroupsWithState state (k (score, id)
  * pairs per key, serialized between micro-batches), emitting each
  * key's current leaderboard after every batch. Because heap insertion
  * is order-insensitive over the input multiset, the streaming state
  * after any prefix of batches equals the batch aggregate over the
  * same rows — asserted by the spec, and the property that makes a
  * live leaderboard trustworthy against replays/restarts.
  *
  * State lifetime (same caveat as [[StreamDedup]]): with
  * `GroupStateTimeout.NoTimeout`, every distinct key holds its k-pair
  * heap FOREVER and re-emits its board each micro-batch — state size
  * and output volume grow with the distinct-key domain, never shrink.
  * That is the correct semantic for a bounded key domain (leaderboards
  * over a fixed entity set); for an unbounded domain (e.g. per-user
  * keys at 100 TB), wrap with [[streamingTtl]] so idle keys expire.
  */
object StreamTopK {

  case class Scored(key: String, score: Double, id: Long)
  case class Entry(rank: Long, score: Double, id: Long)
  case class Board(key: String, entries: Seq[Entry])

  /** Batch twin: delegate to the native aggregate. */
  def batch(df: DataFrame, keyCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(TopKAgg.topK(col(scoreCol), col(idCol), k).as("top"))
      .select(col(keyCol), posexplode(col("top")).as(Seq("i", "r")))
      .select(col(keyCol), (col("i") + 1).cast("long").as("rank"),
        col("r.score").as("score"), col("r.id").as("id"))

  private def fold(k: Int)(key: String, rows: Iterator[Scored],
      state: GroupState[Seq[(Double, Long)]]): Board = {
    val b = new TopKBuffer(k)
    state.getOption.foreach(_.foreach { case (s, i) => b.insert(s, i) })
    rows.foreach(r => b.insert(r.score, r.id))
    val kept = (0 until b.size).map(i => (b.scores(i), b.ids(i)))
    state.update(kept)
    // same total-order comparator as TopKAgg.sortedRows (NaN ranks
    // first) so stream boards stay row-for-row equal to the batch agg
    val ordered = kept.sortWith { case ((sa, ia), (sb, ib)) =>
      val c = java.lang.Double.compare(sa, sb)
      c > 0 || (c == 0 && ia < ib)
    }
    Board(key, ordered.zipWithIndex.map { case ((s, i), r) =>
      Entry(r + 1L, s, i)
    })
  }

  def streaming(scored: Dataset[Scored], k: Int): Dataset[Board] = {
    import scored.sparkSession.implicits._
    scored.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold(k))
  }

  /** TTL variant for unbounded key domains: a key whose last arrival
    * is older than `ttlMs` of processing time has its heap dropped
    * (and emits a final empty board as the tombstone). Bounds total
    * state at (active keys x k pairs) instead of (all keys ever). */
  def streamingTtl(scored: Dataset[Scored], k: Int,
      ttlMs: Long): Dataset[Board] = {
    import scored.sparkSession.implicits._
    scored.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout) {
        (key: String, rows: Iterator[Scored],
         state: GroupState[Seq[(Double, Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Board(key, Seq.empty)
          } else {
            val out = fold(k)(key, rows, state)
            state.setTimeoutDuration(ttlMs)
            out
          }
      }
  }
}
