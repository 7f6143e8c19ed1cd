package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-source token-budget admission — the in-flight counterpart of
  * [[graft.operators.Curation.budgetedSelect]]: a corpus assembly run
  * is told "collect at most N tokens per source/domain" and must stop
  * ADMITTING mid-stream, not sample after the fact. A document is
  * admitted iff the tokens already admitted for its source are still
  * below the budget (the crossing document is admitted, then the gate
  * closes), so admission is a pure prefix of the source's arrival
  * order and never depends on documents that come later.
  *
  * Batch twin and stream gate share one total order (doc_id within
  * source), so stream == batch whenever arrival order respects it —
  * the same contract every other gate in this package documents and
  * specs. State per source is ONE long (tokens admitted); the batch
  * twin is one keyed window, i.e. a single source-keyed shuffle.
  */
object StreamTokenBudget {

  case class Doc(doc_id: Long, source: String, n_tokens: Long)
  /** Per-source gate state (public: encoder codegen instantiates it). */
  case class Used(tokens: Long)

  /** Batch twin: admit docs per source in doc_id order while tokens
    * admitted BEFORE the doc stay under `budget`. */
  def batch(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive (got $budget)")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("source"), col("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .where(col("__cum") - col("n_tokens") < budget)
      .drop("__cum")
  }

  /** Streaming gate: one Long of state per source; rows within a
    * micro-batch process in doc_id order (the batch twin's order). */
  def streaming(docs: Dataset[Doc], budget: Long): Dataset[Doc] = {
    require(budget > 0, s"budget must be positive (got $budget)")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Doc], state: GroupState[Used]) =>
          var used = state.getOption.map(_.tokens).getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
            if (used < budget) { used += d.n_tokens; Some(d) }
            else None
          }
          state.update(Used(used))
          out.iterator
      }
  }
}
