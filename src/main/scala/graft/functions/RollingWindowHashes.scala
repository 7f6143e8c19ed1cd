package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All distinct `windowLen`-codepoint sliding-window hashes of a string,
  * as 128-bit (two-lane polynomial) rolling hashes — the Rabin–Karp
  * replacement for `md5(substr(text, i, k))` per window, which costs
  * O(len · k) digest work and one string allocation per window; this is
  * one O(len) pass, no per-window allocation. Used by the benchmark
  * decontamination scan, where only hash EQUALITY matters (the count of
  * shared windows), so any collision-free hash gives results identical
  * to hashing — or storing — the raw substrings; two independent 64-bit
  * lanes put the corpus-level collision probability below 1e-20 (md5,
  * the previous kernel, made the same wager at 128 bits).
  *
  * Windows advance per CODEPOINT (matching Spark's and DuckDB's
  * character-based `substr`, so the SQL oracle's raw-substring window
  * sets align even on non-BMP text). Output order is first occurrence;
  * duplicates within the string are dropped (the `array_distinct`
  * semantics of the expression this replaces). Null input → null;
  * fewer than `windowLen` codepoints → empty array. */
case class RollingWindowHashes(child: Expression, windowLen: Int)
    extends UnaryExpression {

  override def prettyName: String = "rolling_window_hashes"
  override def dataType: DataType = RollingWindowHashes.OutType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && windowLen >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input and windowLen >= 1")

  override def nullSafeEval(a: Any): Any =
    RollingWindowHashes.compute(a.asInstanceOf[UTF8String], windowLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // one static call — the kernel is plain JVM code, so the stage
      // keeps whole-stage codegen without inlining the loop
      s"${ev.value} = graft.functions.RollingWindowHashes.compute($a, $windowLen);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingWindowHashes {
  val OutType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)

  // two independent polynomial lanes (odd bases, wrap-around mod 2^64)
  private val B1 = 0x100000001b3L // FNV-ish odd multiplier
  private val B2 = 0x9e3779b97f4a7c15L | 1L // golden-ratio odd multiplier

  def compute(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // decode codepoints once
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    // pow = B^(k-1) per lane, for the rolling subtract
    var p1 = 1L; var p2 = 1L
    var i = 0
    while (i < k - 1) { p1 *= B1; p2 *= B2; i += 1 }
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < k) {
      h1 = h1 * B1 + cps(i); h2 = h2 * B2 + cps(i); i += 1
    }
    val seen = new java.util.HashSet[(Long, Long)](n * 2)
    val out = new java.util.ArrayList[InternalRow](n - k + 1)
    def emit(a: Long, b: Long): Unit =
      // dedup keyed on the full 128 bits (both lanes as a pair), so the
      // in-string distinct step makes the same collision wager the
      // docstring promises; store both lanes in the row
      if (seen.add((a, b))) out.add(InternalRow(a, b))
    emit(h1, h2)
    i = k
    while (i < n) {
      h1 = (h1 - cps(i - k) * p1) * B1 + cps(i)
      h2 = (h2 - cps(i - k) * p2) * B2 + cps(i)
      emit(h1, h2)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
