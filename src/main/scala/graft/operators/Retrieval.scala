package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked text retrieval over the corpus — the query-side complement of
  * the indexing/dedup operators (SURVEY extended scope: a training-data
  * pipeline needs "find the documents most relevant to this probe" for
  * targeted curation and contamination audits as much as it needs
  * dedup).
  */
object Retrieval {

  /** Okapi BM25 top-k retrieval (Robertson et al., TREC-3; the Lucene
    * `(1 + ln((N − df + 0.5)/(df + 0.5) + 1))`-free plain variant with
    * the +1-inside-log idf so scores stay positive).
    *
    * Scale shape: the term-frequency table is filtered to the query's
    * terms BEFORE any shuffle (the explode feeds a `where` that prunes
    * ~all rows map-side), document length joins on the doc key once, and
    * the per-term idf table is a handful of rows broadcast to the tf
    * side. One shuffle keyed by doc for the tf aggregate, one for the
    * final per-doc score sum, one window for the top-k — no corpus-wide
    * materialization anywhere, so the plan is the same at 100 TB with a
    * 3-term query as at 60k rows.
    *
    * Determinism: doc-length sums are exact longs; idf/score arithmetic
    * is written in one fixed association order (mirrored verbatim in the
    * oracle SQL); the ranking orders by the ROUNDED score with the doc id
    * as tie-break, so a last-ulp difference can never flip the cut.
    */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val id = col(idCol)
    val words = df.select(id,
      explode(split(trim(col(textCol)), "\\s+")).as("word"))
    // doc length in words + corpus stats (two scalar-ish aggregates; the
    // doc-count/avgdl row is broadcast, never shuffled against the corpus)
    val dl = df.select(id,
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = words.where(col("word").isin(queryTerms: _*))
      .groupBy(id, col("word")).agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("word").agg(count(lit(1)).as("dfc"))
    val idf = dfc.crossJoin(broadcast(stats)).select(col("word"),
      log((col("n_docs").cast("double") - col("dfc") + 0.5) /
        (col("dfc") + 0.5) + 1.0).as("idf"))
    val scored = tf.join(broadcast(idf), "word")
      .join(dl, idCol).crossJoin(broadcast(stats))
      .select(id, col("word"),
        (col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"))
    // fixed per-term association order for the doc total (left-to-right
    // over the query's term order, exactly as the oracle SQL writes it)
    val termSums = queryTerms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("word") === t, col("s"))), lit(0.0)).as(s"__s$i")
    }
    val perDoc = scored.groupBy(id).agg(termSums.head, termSums.tail: _*)
    val total = queryTerms.indices.map(i => col(s"__s$i"))
      .reduceLeft(_ + _)
    val ranked = perDoc.select(id, round(total, 6).as("score"))
    // distributed top-k (TakeOrderedAndProject — per-partition heaps,
    // k rows to the driver stage), THEN the rank window over only k rows;
    // a bare global row_number window would funnel every scored doc
    // through one task
    val w = Window.orderBy(col("score").desc, id.asc)
    ranked.orderBy(col("score").desc, id.asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
  }
}
