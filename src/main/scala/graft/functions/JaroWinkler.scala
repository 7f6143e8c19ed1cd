package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity of two string columns as a native Catalyst
  * expression — the record-linkage scorer Spark lacks (it ships only
  * `levenshtein`). Variant matched to DuckDB's
  * `jaro_winkler_similarity` so results are oracle-checkable:
  * either side empty → 0.0; match window `max(|a|,|b|)/2 − 1`;
  * transpositions = half the mismatched aligned matches; the Winkler
  * prefix boost (p = 0.1, prefix ≤ 4) applies only when jaro > 0.7.
  *
  * Codegen emits one static call (the same shape as Spark's own
  * `levenshtein`, which delegates to a UTF8String method): the row stays
  * inside whole-stage codegen, the O(|a|·|b|)-window scan runs in plain
  * JVM code with two boolean scratch arrays, no boxing. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerAlgo.similarity($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerAlgo {
  /** Entry point shared by eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    sim(a.toString, b.toString)

  def sim(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0; var trans = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // integer half-transpositions (floor), matching DuckDB/RapidFuzz —
    // an odd mismatch count rounds DOWN, not to x.5
    val jaro = (m / l1 + m / l2 + (m - trans / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (l < maxPrefix && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Column-API wrapper. */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(JaroWinkler(
      org.apache.spark.sql.graftshim.ColumnShim.expression(a),
      org.apache.spark.sql.graftshim.ColumnShim.expression(b)))
}
