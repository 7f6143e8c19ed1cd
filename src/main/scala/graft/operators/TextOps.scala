package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for corpus curation: language ID, quality
  * scoring, token counting, fingerprinting. All pure Column expressions
  * (regexp/array builtins) — codegen-friendly, shuffle-free per-row maps
  * that scale linearly with the corpus. */
object TextOps {

  /** Regex occurrence profile: one long count column per named pattern —
    * the PII / boilerplate / keyword scan of a curation pipeline. Pure
    * per-row codegen'd expressions (regexp_extract_all + size), shuffle-
    * free and linear in corpus size. Patterns should stay inside the
    * RE2-compatible subset when cross-engine parity matters (Java regex
    * accepts a superset). */
  def patternProfile(text: Column, patterns: Seq[(String, String)])
      : Seq[Column] =
    patterns.map { case (name, re) =>
      size(regexp_extract_all(text, lit(re), lit(0))).cast(LongType)
        .as(s"n_$name")
    }

  /** Whitespace word count. */
  def wordCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** Let-binding idiom for expensive array subexpressions: wrapping the
    * value in `array(...)` and consuming it through a single-element HOF
    * binds it to a lambda variable, so it is evaluated ONCE per row no
    * matter how many times the body references it. Without this, every
    * reference — especially references inside nested lambda bodies,
    * which re-evaluate per outer element — re-runs the whole pipeline
    * (topBigramFrac went O(W²) pipeline evaluations per row: 143 s for
    * 5 000 docs at sf0.1; 0.6 s with the binding). */
  private def bindArray(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Duplicate-word fraction (1 − distinct/total) — the basic Gopher-rule
    * repetition signal; 0 for empty docs. Per-row array ops, no shuffle. */
  def dupWordFrac(text: Column): Column =
    bindArray(split(trim(text), "\\s+")) { words =>
      when(length(trim(text)) === 0, 0.0).otherwise(
        round(lit(1.0) - size(array_distinct(words)).cast(DoubleType)
          / size(words), 6))
    }

  /** Longest equal-run in a SORTED array divided by its size — the
    * "fraction taken by the most frequent element" kernel shared by the
    * repetition filters: O(n) after the sort, shuffle-free. */
  private def topElementFrac(sorted: Column): Column =
    when(size(sorted) <= 0, 0.0).otherwise {
      // fold over positions 1..n-1 carrying (current run, best run)
      val runs = aggregate(
        sequence(lit(1), size(sorted) - 1),
        struct(lit(1).as("run"), lit(1).as("best")),
        (st, i) => {
          val run = when(
            element_at(sorted, i + 1) === element_at(sorted, i),
            st.getField("run") + 1).otherwise(lit(1))
          struct(run.as("run"),
            greatest(st.getField("best"), run).as("best"))
        })
      round(when(size(sorted) === 1, lit(1.0)).otherwise(
        runs.getField("best").cast(DoubleType) / size(sorted)), 6)
    }

  /** Fraction of word 2-grams taken by the single most frequent 2-gram —
    * the "top n-gram ratio" repetition filter from the Gopher/MassiveText
    * quality rules. Sort the bigrams once, then the longest run of equal
    * adjacent elements IS the top count — O(W log W) per row instead of
    * the O(distinct · W) count-per-distinct scan, shuffle-free. */
  def topBigramFrac(text: Column): Column =
    bindArray(array_sort(Dedup.wordShingles(text, 2)))(topElementFrac)

  /** Both repetition signals from ONE split (and one bigram build):
    * returns struct(dup_word_frac, top_bigram_frac). Computing the two
    * metrics as separate expressions re-runs the split per metric. */
  def repetitionScores(text: Column): Column =
    bindArray(split(trim(text), "\\s+")) { words =>
      val bigrams = filter(
        transform(sequence(lit(0), greatest(size(words) - 2, lit(0))),
          i => when(i + 2 <= size(words),
            array_join(slice(words, i + 1, lit(2)), " "))),
        x => x.isNotNull)
      val dup = when(length(trim(text)) === 0, 0.0).otherwise(
        round(lit(1.0) - size(array_distinct(words)).cast(DoubleType)
          / size(words), 6))
      struct(dup.as("dup_word_frac"),
        bindArray(array_sort(bigrams))(topElementFrac)
          .as("top_bigram_frac"))
    }

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (the usual pre-tokenizer shape). */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(TokenPattern), lit(0)))

  /** Quality score in [0,1]: blend of length band, alpha ratio, mean word
    * length band, and repetition (distinct-word ratio). Deterministic
    * integer/double arithmetic only. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast(DoubleType)
    val words = split(trim(text), "\\s+")
    val nWords = size(words).cast(DoubleType)
    val nDistinct = size(array_distinct(words)).cast(DoubleType)
    val alpha = length(regexp_replace(text, "[^A-Za-z]", ""))
      .cast(DoubleType)
    val lengthOk = when(nChars >= 100 && nChars <= 10000, 1.0)
      .otherwise(nChars / 10000.0 + 0.01)
    val alphaRatio = alpha / greatest(nChars, lit(1.0))
    val meanWordLen = alpha / greatest(nWords, lit(1.0))
    val wordLenOk = when(meanWordLen >= 3 && meanWordLen <= 10, 1.0)
      .otherwise(0.5)
    val distinctRatio = nDistinct / greatest(nWords, lit(1.0))
    round(least(lengthOk, lit(1.0)) * lit(0.25)
      + alphaRatio * lit(0.25)
      + wordLenOk * lit(0.25)
      + distinctRatio * lit(0.25), 6)
  }

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose — the point is the distributed shape
    * (per-row scoring against a broadcast-literal table), not the model. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Predicted language: the marker set with the highest hit count,
    * earliest language winning ties (deterministic); "und" when no marker
    * hits at all. */
  def langId(text: Column): Column = {
    val words = split(lower(text), "\\s+")
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, ms) =>
      lang -> size(filter(words, w =>
        ms.map(m => w === lit(m)).reduce(_ || _)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight nests the first language's `when` outermost, so the FIRST
    // max-scoring language wins ties deterministically
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Canonical content fingerprint: lowercase, collapse whitespace, sort
    * the distinct words, md5 — robust to word order and repetition (the
    * classic "fingerprint" clustering key). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(
      split(lower(trim(text)), "\\s+"))), " "))

  /** Word-window chunking for training pipelines: fixed `chunkSize`-word
    * chunks advancing by `chunkSize - overlap` words. Returns an array of
    * (start_word, chunk_text) structs — explode downstream. Pure
    * higher-order functions, per-row, shuffle-free. */
  def chunkWords(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val words = split(trim(text), "\\s+")
    transform(
      sequence(lit(0), greatest(size(words) - 1, lit(0)), lit(step)),
      start => struct(start.as("start_word"),
        array_join(slice(words, start + 1, lit(chunkSize)), " ")
          .as("chunk_text")))
  }

  /** Unicode NFC canonical normalization — a native codegen'd Catalyst
    * expression ([[graft.functions.NfcNormalize]], matched to DuckDB's
    * `nfc_normalize`); Spark ships no builtin. Decomposed and
    * precomposed spellings of the same text must hash/shingle/dedup
    * identically, so this runs FIRST in any ingest chain. */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.NfcNormalize(
        org.apache.spark.sql.graftshim.ColumnShim.expression(text)))

  /** Full ingest text cleanup: NFC canonical form, control/format
    * characters (C0/C1, zero-widths, BOM) to spaces, whitespace runs
    * collapsed, ends trimmed. Pure per-row expressions (the NFC step
    * is the codegen'd native expression, the rest is two regexes) —
    * shuffle-free, and every step has an exact DuckDB twin
    * (`nfc_normalize` + the same RE2-compatible classes) so the
    * cleanup is oracle-checkable end to end. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(nfcNormalize(text),
      "[\\p{Cc}\\p{Cf}]", " "), "\\s+", " "))

  /** Order-sensitive polynomial rolling hash over the word sequence
    * (base-P Horner fold of per-word xxhash64) — the streaming-friendly
    * fingerprint: O(1) per word, content+order sensitive, pure
    * higher-order functions. */
  def rollingHash(text: Column): Column = {
    // modular Horner fold (Mersenne prime 2^31-1): products stay far below
    // Long.MaxValue, so it is ANSI-mode safe (no wraparound arithmetic)
    val M = 2147483647L
    aggregate(split(lower(trim(text)), "\\s+"), lit(0L),
      (acc, w) => pmod(acc * lit(1000003L) + pmod(xxhash64(w), lit(M)),
        lit(M)))
  }
}
