package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product of two numeric array columns, accumulated in double
  * in element order.
  *
  * The SQL-higher-order-function equivalent
  * (`aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,z) -> acc+z)`) is a
  * CodegenFallback — it allocates an intermediate array and interprets the
  * lambda per element, which dominates the runtime of all-pairs cosine
  * scans. This expression generates a tight fused loop (doGenCode), keeps
  * the whole stage inside Janino codegen, and preserves the exact
  * left-to-right double accumulation semantics so results are bit-identical
  * to the fold (and to the DuckDB oracle's sequential list_dot_product).
  *
  * Semantics match the HOF fold EXACTLY for every input (this is what makes
  * the [[RewriteHofDotProduct]] optimizer rule sound, not just fast):
  *  - null input array → null;
  *  - unequal lengths → null (zip_with pads the shorter side with nulls,
  *    null * x → null, acc + null → null);
  *  - any null element in the compared range → null (same propagation).
  * The per-element null check is skipped at codegen time when the array
  * schema says containsNull=false, so embedding-typed columns keep the
  * branch-free loop.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType
  // null also on length mismatch / null elements, regardless of child
  // nullability
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if ((elemNullable(left) || elemNullable(right)) && {
        var i = 0; var hasNull = false
        while (i < n && !hasNull) {
          hasNull = x.isNullAt(i) || y.isNullAt(i); i += 1
        }
        hasNull
      }) return null
    var acc = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      case (DoubleType, DoubleType) =>
        while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      case (FloatType, DoubleType) =>
        while (i < n) { acc += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
      case (DoubleType, FloatType) =>
        while (i < n) { acc += x.getDouble(i) * y.getFloat(i).toDouble; i += 1 }
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String) = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += ${getter(elemType(left), a, i)} * ${getter(elemType(right), b, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
