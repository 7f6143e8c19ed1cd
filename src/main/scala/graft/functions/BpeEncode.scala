package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Preprocessed BPE merge table + the one-pass encoder it drives.
  *
  * Replaces the chained-`regexp_replace` encoder (one regex scan and
  * one string rebuild PER MERGE per word — the largest per-row CPU
  * cost in the tokenizer chain, and a hard ceiling on merge-list
  * length) with a native per-word merge loop whose semantics are
  * EXACTLY the chained left-to-right non-overlapping replace the
  * learner and the DuckDB oracle apply:
  *
  *  - the FAST PATH is the classic rank-priority encode (GPT-2 style:
  *    repeatedly merge the leftmost occurrence of the lowest-ranked
  *    adjacent pair) — O(len²) per word, INDEPENDENT of merge count,
  *    which is what makes 32k-merge vocabularies affordable;
  *  - rank-priority equals sequential per-merge passes only when the
  *    merge list is "well-formed": every component is a base symbol
  *    (one char) or the output of an EARLIER merge, and all outputs
  *    are distinct (then a merged-away pair can never re-appear, so
  *    processing rank k after all ranks < k is exhaustive — the
  *    property sequentially-learned lists have by construction);
  *  - lists that fail the check (possible only for hand-built or
  *    adversarial inputs: two merges producing the same string) fall
  *    back to the exact per-merge pass loop — still native and
  *    allocation-light, just O(merges × len).
  *
  * Serializable: ships to executors inside the expression's reference
  * array; the lookup structures rebuild lazily per JVM.
  *
  * `unicode = false` (the default) models lowercase-ASCII `[a-z]+`
  * words only — every other whitespace token passes through as one
  * OOV token. `unicode = true` lifts the word class to full-Unicode
  * letters and numbers (`[\p{L}\p{N}]+`, the Java/RE2 categories —
  * matched code point for code point by [[BpeMergeTable.isWordUni]]),
  * and symbols are CODE POINTS, so accented/Cyrillic/CJK/digit words
  * enter the learned vocabulary instead of bypassing it. The sentinel
  * `·` (U+00B7, category Po) is in neither class, so it still can
  * never occur inside a symbol. The mode must match the learner's
  * ([[graft.operators.Tokenizer]] passes it through both jobs).
  *
  * `byteFallback = true` (implies the unicode word class) removes the
  * OOV passthrough entirely: EVERY whitespace token encodes — in-class
  * code points as themselves, out-of-class code points as their UTF-8
  * bytes' placeholder symbols ([[BpeByteAlphabet]], the one shared
  * mapping) — so `don't` / `co-op` / `3.14` / URLs / emoji enter the
  * learned vocabulary instead of surviving as single opaque tokens.
  */
final class BpeMergeTable(val merges: Seq[(String, String)],
    val unicode: Boolean = false, val byteFallback: Boolean = false)
    extends Serializable {

  /** Well-formedness for the rank-priority path (see class doc). A
    * base symbol is one CODE POINT (a supplementary-plane character is
    * two chars but still a base symbol in unicode mode). */
  @transient private lazy val priorityOk: Boolean = {
    val outputs = new java.util.HashSet[String]()
    def base(s: String): Boolean =
      s.nonEmpty && s.codePointCount(0, s.length) == 1
    merges.forall { case (l, r) =>
      (base(l) || outputs.contains(l)) &&
        (base(r) || outputs.contains(r)) &&
        outputs.add(l + r)
    }
  }

  /** rank lookup: left symbol -> (right symbol -> 0-based rank) */
  @transient private lazy val ranks
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.computeIfAbsent(l, _ => new java.util.HashMap[String, Integer]())
        .putIfAbsent(r, Integer.valueOf(i))
    }
    m
  }

  private def rankOf(l: String, r: String): Int = {
    val byR = ranks.get(l)
    if (byR == null) Int.MaxValue
    else {
      val v = byR.get(r)
      if (v == null) Int.MaxValue else v.intValue()
    }
  }

  /** The ONE merge core (count and pieces both read it, so
    * `size(bpe_tokenize) == bpe_token_count` holds structurally, not
    * by keeping twin loops in sync): merge `syms(0 until n)` in place
    * and return the surviving symbol count. Rank-priority loop on the
    * fast path, sequential left-to-right sweeps per merge on the
    * fallback (the exact replay of the chained replaces). */
  private def mergeInPlace(syms: Array[String], n0: Int): Int = {
    var n = n0
    if (n < 2) return n
    if (priorityOk) {
      while (n > 1) {
        var bestRank = Int.MaxValue
        var bestPos = -1
        var j = 0
        while (j < n - 1) {
          val r = rankOf(syms(j), syms(j + 1))
          if (r < bestRank) { bestRank = r; bestPos = j }
          j += 1
        }
        if (bestPos < 0) return n
        syms(bestPos) = syms(bestPos) + syms(bestPos + 1)
        System.arraycopy(syms, bestPos + 2, syms, bestPos + 1,
          n - bestPos - 2)
        n -= 1
      }
      n
    } else {
      merges.foreach { case (l, r) =>
        var read = 0
        var write = 0
        while (read < n) {
          if (read + 1 < n && syms(read) == l && syms(read + 1) == r) {
            syms(write) = l + r; read += 2
          } else { syms(write) = syms(read); read += 1 }
          write += 1
        }
        n = write
      }
      n
    }
  }

  /** One symbol per CODE POINT (identical to per-char on `[a-z]+`
    * words; in unicode mode this is what keeps supplementary-plane
    * characters whole instead of splitting surrogates). */
  private def initialSyms(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val syms = new Array[String](math.max(n, 1))
    var i = 0
    var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms(k) = new String(Character.toChars(cp))
      k += 1
      i += Character.charCount(cp)
    }
    syms
  }

  /** Token count of one already-validated in-class word. */
  def encodeCount(word: String): Int = {
    val syms = initialSyms(word)
    mergeInPlace(syms, word.codePointCount(0, word.length))
  }

  /** The surviving symbols of one in-class word, in order — the
    * count's sibling for consumers that need the PIECES. */
  def encodePieces(word: String): Array[String] = {
    val syms = initialSyms(word)
    java.util.Arrays.copyOf(syms,
      mergeInPlace(syms, word.codePointCount(0, word.length)))
  }

  /** Whole-document token sequence: every `[a-z]+` word's merged
    * pieces in order, every other word passed through whole as its
    * own OOV token — `tokenize(text).length == countTokens(text)` by
    * construction. */
  def tokenize(text: UTF8String): Array[UTF8String] =
    tokenize(text, marker = false)

  /** `marker = true` prefixes the FIRST piece of every whitespace
    * token with the sentinel `·` (U+00B7 — outside the word classes,
    * the byte-placeholder run, and therefore outside every non-first
    * piece): the GPT-2 `Ġ` word-boundary discipline, which is what
    * makes the sequence INVERTIBLE ([[BpeDetok]]). A raw OOV
    * passthrough may itself begin with `·`; that is still unambiguous
    * — the marker is prepended exactly once, so the decoder strips
    * one leading `·` per word start and keeps the rest. Marker off is
    * bit-identical to the historical output (count parity spec'd). */
  def tokenize(text: UTF8String, marker: Boolean): Array[UTF8String] = {
    val s = text.toLowerCase.trim().toString
    val words = wsSplit.split(s, -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (byteFallback && w.nonEmpty) {
        val ps = fallbackPieces(w)
        var j = 0
        while (j < ps.length) {
          out += UTF8String.fromString(
            if (marker && j == 0) "·" + ps(j) else ps(j))
          j += 1
        }
      } else if (!byteFallback && isWord(w)) {
        val ps = encodePieces(w)
        var j = 0
        while (j < ps.length) {
          out += UTF8String.fromString(
            if (marker && j == 0) "·" + ps(j) else ps(j))
          j += 1
        }
      } else out += UTF8String.fromString(if (marker) "·" + w else w)
      i += 1
    }
    out.toArray
  }

  /** Byte-fallback encode of one whitespace token: the shared
    * [[BpeByteAlphabet.symbols]] initial sequence (in-class code
    * points + byte placeholders) through the same merge core. */
  private def fallbackPieces(word: String): Array[String] = {
    val syms = BpeByteAlphabet.symbols(word)
    java.util.Arrays.copyOf(syms, mergeInPlace(syms, syms.length))
  }

  @transient private lazy val wsSplit = java.util.regex.Pattern
    .compile("\\s+")

  private def isWord(w: String): Boolean =
    if (unicode) isWordUni(w) else isAlpha(w)

  private def isAlpha(w: String): Boolean = {
    if (w.isEmpty) return false
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (c < 'a' || c > 'z') return false
      i += 1
    }
    true
  }

  /** `^[\p{L}\p{N}]+$` code point for code point: Unicode Letter (the
    * five L categories, `Character.isLetter`) or Number (Nd ∪ Nl ∪ No
    * — note `Character.isDigit` alone is only Nd and would reject
    * `Ⅻ`/`²` that the regex class accepts; verified category-parity
    * against the Java pattern over the BMP). */
  private def isWordUni(w: String): Boolean = {
    if (w.isEmpty) return false
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      if (!Character.isLetter(cp)) {
        val t = Character.getType(cp)
        if (t != Character.DECIMAL_DIGIT_NUMBER &&
            t != Character.LETTER_NUMBER &&
            t != Character.OTHER_NUMBER) return false
      }
      i += Character.charCount(cp)
    }
    true
  }

  /** Whole-document token count, replicating the Column-expression
    * formulation symbol for symbol: `split(trim(lower(text)), "\s+")`
    * (the UTF8String lower/trim the builtins use, Java-regex split
    * with limit -1 as StringSplit does), each `[a-z]+` word encoded,
    * every other word one OOV token. */
  def countTokens(text: UTF8String): Long = {
    val s = text.toLowerCase.trim().toString
    val words = wsSplit.split(s, -1)
    var sum = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      sum += (if (byteFallback && w.nonEmpty) {
        val syms = BpeByteAlphabet.symbols(w)
        mergeInPlace(syms, syms.length).toLong
      } else if (!byteFallback && isWord(w)) encodeCount(w).toLong
      else 1L)
      i += 1
    }
    sum
  }
}

/** `bpe_token_count(text)` — tokenizer-aware token counting under a
  * learned merge list as ONE native codegen'd expression (the
  * [[NfcNormalize]] shape: a single static-call site keeps the row
  * inside whole-stage codegen). The merge list is bound at plan time
  * (the learn→encode two-job contract collects ≤vocab-bounded merges
  * to the driver); the per-row work is the [[BpeMergeTable]] encode
  * loop — no regex chain, no per-merge string rebuilds, and the cost
  * is independent of merge-list length on the fast path. */
/** `bpe_tokenize(text)` — the token SEQUENCE under a learned merge
  * list (the [[BpeTokenCount]] sibling for consumers that pack or
  * inspect actual pieces: sequence packing, vocabulary audits,
  * fertility stats). Same per-row encode loop, materializing the
  * pieces instead of counting them; still one native expression, zero
  * shuffle — `size(bpe_tokenize(text)) == bpe_token_count(text)` by
  * construction (spec'd). */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)],
    unicode: Boolean = false, byteFallback: Boolean = false,
    wordMarker: Boolean = false)
    extends UnaryExpression {

  override def prettyName: String = "bpe_tokenize"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  @transient private lazy val table =
    new BpeMergeTable(merges, unicode, byteFallback)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      table.tokenize(s.asInstanceOf[UTF8String], wordMarker)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    (Object[]) $ref.tokenize($s, $wordMarker));""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `bpe_detok(pieces)` — the tokenizer's INVERSE over a word-marked
  * piece sequence ([[BpeTokenize]] with `wordMarker = true`): strip
  * one leading `·` at each word start, concatenate the pieces of each
  * word, turn byte-placeholder runs (U+2500..U+25FF,
  * [[BpeByteAlphabet]]) back into their UTF-8 characters, and join
  * words with single spaces. `detok(tokenize(text)) ==
  * single-spaced(trim(lower(text)))` EXACTLY in byte-fallback mode
  * (no out-of-class character survives encoding, so no placeholder
  * collision is possible); in the in-class modes the round trip is
  * exact whenever the raw text contains no U+2500..U+25FF characters
  * (an OOV passthrough carrying a literal box-drawing character would
  * be byte-inverted — the fallback mode exists precisely to remove
  * that class of token). A malformed placeholder run (impossible from
  * the encoder) decodes through Java's UTF-8 replacement character
  * rather than throwing: the decoder is total. */
case class BpeDetok(child: Expression) extends UnaryExpression {

  override def prettyName: String = "bpe_detok"
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> input, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any =
    BpeDetok.detok(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BpeDetok.detok($a);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BpeDetok {
  /** Word-marked pieces → text (see [[BpeDetok]]). Static call site
    * keeps the row inside whole-stage codegen. */
  def detok(
      pieces: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val n = pieces.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    val bytes = new java.io.ByteArrayOutputStream()
    def flushBytes(): Unit = if (bytes.size() > 0) {
      sb.append(new String(bytes.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      bytes.reset()
    }
    var i = 0
    var started = false
    while (i < n) {
      var p = pieces.getUTF8String(i).toString
      if (p.nonEmpty && p.charAt(0) == '·') {
        // word start: space-separate (the first word gets none) and
        // strip exactly the one prepended marker
        flushBytes()
        if (started) sb.append(' ')
        started = true
        p = p.substring(1)
      }
      var j = 0
      while (j < p.length) {
        val c = p.charAt(j)
        if (c >= 0x2500 && c <= 0x25FF)
          bytes.write(c - BpeByteAlphabet.Base)
        else { flushBytes(); sb.append(c) }
        j += 1
      }
      i += 1
    }
    flushBytes()
    UTF8String.fromString(sb.toString)
  }
}

/** Sequential per-merge passes over a sentinel-delimited symbol
  * sequence — the LEARNER's merge-application step for a whole round
  * in one call. Semantics are EXACTLY the chained
  * `regexp_replace(seq, '·l··r·', '·lr·')` projections it replaces
  * (and the oracle's `replace` chain): for each merge in order, one
  * left-to-right non-overlapping sweep. The doubled sentinel makes
  * the string replace and this symbol-array sweep the same operation
  * (delimiters are never shared between adjacent matches; a pattern
  * can never match across a symbol boundary), so swapping the regex
  * chain for this is a PLAN-SHAPE change only: one projection per
  * round instead of one per merge, which is what keeps driver
  * re-analysis cost flat when a round carries 64-128 picks. */
final class BpeSeqApplier(val merges: Seq[(String, String)])
    extends Serializable {
  def apply(seq: UTF8String): UTF8String = {
    val s = seq.toString
    // trim sentinel runs at both ends (the engine/oracle trim), then
    // split on the doubled sentinel; symbols never contain '·'
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == '·') lo += 1
    while (hi > lo && s.charAt(hi - 1) == '·') hi -= 1
    if (lo >= hi) return seq
    val syms = s.substring(lo, hi).split("··", -1)
    var n = syms.length
    merges.foreach { case (l, r) =>
      var read = 0
      var write = 0
      while (read < n) {
        if (read + 1 < n && syms(read) == l && syms(read + 1) == r) {
          syms(write) = l + r; read += 2
        } else { syms(write) = syms(read); read += 1 }
        write += 1
      }
      n = write
    }
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < n) {
      sb.append('·').append(syms(i)).append('·')
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `bpe_seq_apply(seq)` — one round's merges applied to the learner's
  * vocabulary seq column as ONE native codegen'd expression (see
  * [[BpeSeqApplier]]). */
case class BpeSeqApply(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {

  override def prettyName: String = "bpe_seq_apply"
  override def dataType: DataType = StringType

  @transient private lazy val applier = new BpeSeqApplier(merges)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    applier(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApplier", applier,
      classOf[BpeSeqApplier].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.apply($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

case class BpeTokenCount(child: Expression,
    merges: Seq[(String, String)], unicode: Boolean = false,
    byteFallback: Boolean = false)
    extends UnaryExpression {

  override def prettyName: String = "bpe_token_count"
  override def dataType: DataType = LongType

  @transient private lazy val table =
    new BpeMergeTable(merges, unicode, byteFallback)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    table.countTokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.countTokens($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
