package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed tokenizer induction — byte-pair-encoding merge learning
  * (Sennrich et al., ACL 2016, arXiv:1508.07909), the step that sits
  * between corpus curation and model training in an LLM data pipeline.
  * (No reference analog; extension operator like the rest of the
  * curation suite.)
  */
object Tokenizer {

  /** The symbol-boundary sentinel. Input words are restricted to
    * `[a-z]+` so a sentinel can never occur inside a symbol. */
  private val S = "·"

  /** Learn the first `merges` BPE merge operations over the corpus.
    *
    * The corpus collapses to its WORD VOCABULARY first — one map-side-
    * combined hash aggregate; every later round runs over vocab rows
    * weighted by corpus frequency, never corpus rows (the classic BPE
    * formulation, and the property that makes this viable at 100 TB:
    * the loop's working set is vocabulary-bounded). Each word is
    * encoded as a sentinel-delimited symbol sequence (`chat` →
    * `·c··h··a··t·`). Each round then does:
    *
    *  - ONE vocab-bounded pair-count aggregate (adjacent-symbol pairs
    *    via projection-local array ops, map-side combined);
    *  - an argmax pick — `orderBy.limit(1)` is a bounded
    *    `TakeOrderedAndProject`, one row to the driver (ties break on
    *    the pair's lexicographic order, so learning is deterministic);
    *  - a projection-local `replace` applying the merge — no shuffle.
    *
    * The DOUBLED sentinel makes plain left-to-right non-overlapping
    * `replace` exactly the BPE merge step: delimiters are never shared
    * between adjacent matches (`·a··a··a··a·` → `·aa··aa·`, as BPE
    * requires), and a pattern can never match across a symbol boundary
    * (`·a··bc·` does not contain `·a··b·`). `replace` scans
    * left-to-right non-overlapping in every engine, so the oracle
    * replays the loop exactly as chained CTEs.
    *
    * Learning stops early when no pair reaches `minCount` — the same
    * convergence rule as the reference BPE implementation.
    *
    * Returns one row per learned merge, in learning order:
    * (step, lhs, rhs, merged, pair_count).
    */
  def bpeMerges(df: DataFrame, textCol: String, merges: Int,
      minCount: Long = 1L): DataFrame = {
    require(merges >= 1 && merges <= 64,
      s"merges must be in [1, 64] (got $merges): each merge is a " +
        "driver-coordinated round")
    val spark = df.sparkSession
    // word vocabulary, each word as its initial symbol sequence
    val vocab0 = Dedup.tracked(df
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("w"), "(.)", S + "$1" + S).as("seq"),
        col("cnt")))

    def pairCounts(v: DataFrame): DataFrame = {
      val tk = split(org.apache.spark.sql.functions.trim(col("seq"), S),
        S + S)
      val pairs = zip_with(
        slice(tk, lit(1), size(tk) - 1),
        slice(tk, lit(2), size(tk) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))
      v.select(col("cnt"), explode(pairs).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
    }

    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var vocab = vocab0
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val top = pairCounts(vocab).where(col("c") >= minCount)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      top.headOption match {
        case Some(Row(l: String, r: String, c: Long)) =>
          learned += ((step, l, r, l + r, c))
          // projection-local merge application; the chain over the
          // persisted vocab base stays <= `merges` projections deep
          vocab = vocab.withColumn("seq",
            regexp_replace(col("seq"),
              java.util.regex.Pattern.quote(S + l + S + S + r + S),
              java.util.regex.Matcher.quoteReplacement(S + l + r + S)))
          step += 1
        case _ => done = true
      }
    }
    import spark.implicits._
    learned.toSeq
      .toDF("step", "lhs", "rhs", "merged", "pair_count")
      .select(col("step").cast("long"), col("lhs"), col("rhs"),
        col("merged"), col("pair_count"))
  }

  /** Tokenizer-aware token counting — encode every document under an
    * already-learned merge list (the run half of the learn→encode
    * two-job contract: [[bpeMerges]] is the bounded job 1, its ≤64-row
    * result collects to literals, and this is job 2 over the corpus).
    *
    * Per document: alphabetic words are sentinel-encoded and the merge
    * chain applies IN LEARNING ORDER as `merges.size` projection-local
    * replaces (the same doubled-sentinel left-to-right semantics the
    * learner used), then the token count is the surviving symbol
    * count; every other word counts as one OOV token. The whole pass
    * is pure per-row Column expressions — ZERO shuffle, no join: at
    * 100 TB this is a map-only scan, which is exactly what a
    * token-budget accounting pass over a full corpus must be.
    *
    * Returns (doc_id, n_words, n_tokens).
    */
  def bpeTokenCounts(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty && merges.size <= 64,
      s"merges must be 1..64 literal pairs (got ${merges.size})")
    val words = split(trim(lower(col(textCol))), "\\s+")
    def nTok(w: org.apache.spark.sql.Column) = {
      val enc0 = regexp_replace(w, "(.)", S + "$1" + S)
      val enc = merges.foldLeft(enc0) { case (e, (l, r)) =>
        regexp_replace(e,
          java.util.regex.Pattern.quote(S + l + S + S + r + S),
          java.util.regex.Matcher.quoteReplacement(S + l + r + S))
      }
      size(split(org.apache.spark.sql.functions.trim(enc, S), S + S))
        .cast("long")
    }
    df.select(col(idCol).as("doc_id"),
      size(words).cast("long").as("n_words"),
      aggregate(words, lit(0L),
        (acc, w) => acc + when(w.rlike("^[a-z]+$"), nTok(w))
          .otherwise(lit(1L))).as("n_tokens"))
  }
}
