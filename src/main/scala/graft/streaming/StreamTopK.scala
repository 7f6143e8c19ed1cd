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
    val ordered = kept.sortBy { case (s, i) => (-s, i) }
    Board(key, ordered.zipWithIndex.map { case ((s, i), r) =>
      Entry(r + 1L, s, i)
    })
  }

  def streaming(scored: Dataset[Scored], k: Int): Dataset[Board] = {
    import scored.sparkSession.implicits._
    scored.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold(k))
  }
}
