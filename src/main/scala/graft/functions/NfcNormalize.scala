package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native Catalyst expression
  * — the first transform of any text-ingest pipeline (decomposed
  * `e`+COMBINING ACUTE and precomposed `é` must hash/shingle/dedup as
  * the same document) and one Spark ships no builtin for. Matched to
  * DuckDB's `nfc_normalize` so results are oracle-checkable.
  *
  * Codegen emits one static call (the `levenshtein`/`jaro_winkler`
  * shape): the row stays inside whole-stage codegen; the fast path
  * (`Normalizer.isNormalized`, true for all-ASCII) avoids allocating
  * for the overwhelmingly common case of already-normal text.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeAlgo.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalizeAlgo.normalize($s);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object NfcNormalizeAlgo {
  /** Entry point shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}
