package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The BYTE-FALLBACK symbol alphabet — the GPT-2 discipline (Radford
  * et al. 2019, the `bytes_to_unicode` table) adapted to the mixed
  * word/byte vocabulary this tokenizer learns: in-class code points
  * (Unicode letters and numbers, the `[\p{L}\p{N}]` classes) stay
  * code-point symbols exactly as unicode mode defines them, and every
  * OTHER code point decomposes into its UTF-8 bytes, each byte mapped
  * to one PRINTABLE PLACEHOLDER code point `U+2500 + b` (the Box
  * Drawing / Block Elements / Geometric Shapes run — 256 consecutive
  * code points, all category So). With the fallback, EVERY whitespace
  * token enters the learned vocabulary — `don't`, `co-op`, `3.14`,
  * URLs, emoji — instead of passing through as a single OOV token.
  *
  * Why U+2500..U+25FF and not GPT-2's identity-for-printables table:
  * GPT-2 encodes ALL text as bytes, so byte symbols and letters can
  * never be confused. Here the alphabet is MIXED — if byte 0x61
  * mapped to `a`, merges learned over apostrophes' byte contexts
  * would conflate with the letter `a`'s word contexts. The chosen run
  * is 256 code points that are (a) outside both `\p{L}` and `\p{N}`
  * (never collide with an in-class symbol), (b) not the sentinel
  * U+00B7, and (c) single BMP code points (base symbols for the
  * encoder's rank-priority well-formedness check).
  *
  * This object is the ONE definition of the mapping: the learner's
  * initial-vocabulary expression ([[BpeFallbackSeq]]) and the native
  * encoder ([[BpeMergeTable]]) both call [[symbols]], so the two jobs
  * of the learn→encode contract cannot drift.
  */
object BpeByteAlphabet {

  /** First placeholder code point; byte b maps to `Base + b`. */
  final val Base = 0x2500

  /** Is `cp` an in-class code point (`[\p{L}\p{N}]` — the unicode
    * word class, per code point)? Letter is the five L categories;
    * Number is Nd ∪ Nl ∪ No (`Character.isDigit` alone is only Nd). */
  def inClass(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }

  /** The placeholder symbol of one byte. */
  def byteSym(b: Int): String =
    String.valueOf((Base + (b & 0xFF)).toChar)

  /** The initial symbol sequence of one whitespace token under the
    * fallback: in-class code points as themselves, every other code
    * point as its UTF-8 bytes' placeholder symbols. The UTF-8
    * expansion is the standard arithmetic (1/2/3/4 bytes by code
    * point range), written out so the DuckDB oracle can replay it
    * with the same integer formulas. */
  def symbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](
      word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      if (inClass(cp)) out += new String(Character.toChars(cp))
      else if (cp < 0x80) out += byteSym(cp)
      else if (cp < 0x800) {
        out += byteSym(0xC0 | (cp >> 6))
        out += byteSym(0x80 | (cp & 0x3F))
      } else if (cp < 0x10000) {
        out += byteSym(0xE0 | (cp >> 12))
        out += byteSym(0x80 | ((cp >> 6) & 0x3F))
        out += byteSym(0x80 | (cp & 0x3F))
      } else {
        out += byteSym(0xF0 | (cp >> 18))
        out += byteSym(0x80 | ((cp >> 12) & 0x3F))
        out += byteSym(0x80 | ((cp >> 6) & 0x3F))
        out += byteSym(0x80 | (cp & 0x3F))
      }
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** The sentinel-delimited seq string the learner's vocabulary
    * holds (`don't` → `·d··o··n··┧··t·` — U+2527 is byte 0x27). */
  def seq(word: UTF8String): UTF8String = {
    val syms = symbols(word.toString)
    val sb = new java.lang.StringBuilder(word.numChars() * 3 + 8)
    var i = 0
    while (i < syms.length) {
      sb.append('·').append(syms(i)).append('·')
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `bpe_fallback_seq(word)` — the byte-fallback initial symbol
  * sequence as a native codegen'd expression: the learner's
  * vocabulary-construction twin of the encoder's in-JVM
  * [[BpeByteAlphabet.symbols]] (literally the same call), replacing
  * the `regexp_replace(w, "(.)", "·$1·")` projection the in-class
  * modes use (a regex cannot compute UTF-8 byte arithmetic). */
case class BpeFallbackSeq(child: Expression) extends UnaryExpression {

  override def prettyName: String = "bpe_fallback_seq"
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    BpeByteAlphabet.seq(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeByteAlphabet.seq($s);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
