package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `n`-word shingles of a single-space-separated text, each the
  * n words joined by one space — the native kernel behind
  * [[graft.operators.Dedup.wordShingles]]. Replaces the
  * split → transform(sequence) → slice → array_join → filter
  * higher-order pipeline, whose per-shingle array slices and joins
  * were measured as the single largest slice of the PPJoin near-dup
  * operator at bench scale (SCALE.md round 19); this is one pass over
  * the string's bytes with one boundary array and zero-copy byte-range
  * shingle slices.
  *
  * Exact drop-in semantics (spec-pinned against the HOF form):
  * "words" are the segments of a split on EVERY single space (regex
  * `" "` with Spark's keep-empty-trailing -1 limit — consecutive
  * spaces produce empty words, exactly as the HOF saw them); shingle
  * i is words[i..i+n) joined by " ", which — because every separator
  * is exactly one space — is the original byte span from the start of
  * word i to the end of word i+n−1; fewer than n words → empty array.
  * With `distinct` the in-document duplicates are dropped keeping
  * first occurrence (the `array_distinct` the four dedup call sites
  * applied on top, folded into the same pass).
  *
  * NULL input yields an EMPTY ARRAY, not null — the HOF form's
  * behavior (its `transform` runs over a literal index sequence, so a
  * null text falls through the `when` to an all-null array that the
  * closing `filter` empties), and the equality the spec pins.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def prettyName: String = "word_shingles"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input and n >= 1")

  override def eval(input: InternalRow): Any =
    WordShingles.compute(
      child.eval(input).asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    // one static call — the kernel is plain JVM code (null-tolerant),
    // so the stage keeps whole-stage codegen without inlining the loop
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.WordShingles.compute(
          ${c.isNull} ? null : ${c.value}, $n, $distinct);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (s == null) return Empty
    // one defensive copy of the bytes; every shingle below is a
    // zero-copy UTF8String view into it (a space is a single byte
    // that can never occur inside a multi-byte UTF-8 sequence, so
    // byte-level splitting equals codepoint-level splitting)
    val bytes = s.getBytes
    // word start offsets: 0, and every position after a 0x20 byte
    var words = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') words += 1
      i += 1
    }
    if (words < n) return Empty
    val starts = new Array[Int](words + 1)
    var w = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(words) = bytes.length + 1 // sentinel: "separator" past the end
    val m = words - n + 1
    val out = new java.util.ArrayList[AnyRef](m)
    val seen =
      if (distinct) new java.util.HashSet[UTF8String](m * 2) else null
    i = 0
    while (i < m) {
      val from = starts(i)
      // end of word i+n-1 = one before the separator that starts
      // word i+n (the sentinel handles the final shingle)
      val until = starts(i + n) - 1
      val sh = UTF8String.fromBytes(bytes, from, until - from)
      if (seen == null || seen.add(sh)) out.add(sh)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
