package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the higher-order-function dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x) * CAST(y)), 0.0,
  *               (acc, z) -> acc + z) }}}
  *
  * into the codegen'd [[VectorDot]] expression. Users (and SQL authors)
  * can write the portable HOF form and still get the fused loop.
  *
  * The rewrite is semantics-preserving for EVERY input, not just
  * well-formed embeddings: VectorDot returns null on unequal array
  * lengths and on null elements — exactly what the zip_with + fold form
  * produces (zip_with pads the shorter array with nulls; null * x and
  * acc + null are null) — and accumulates left-to-right in double, so
  * results are bit-identical.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleCastOf(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case c: Cast => c.dataType == DoubleType && c.child.semanticEquals(v)
      case other => other.semanticEquals(v) && other.dataType == DoubleType
    }

  /** VectorDot's eval/codegen only handle float/double element arrays;
    * the HOF idiom is legal over any numeric element type (the lambda
    * casts), so the rewrite must not fire for e.g. array<int> inputs. */
  private def isFloatingArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable,
                y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(accRef, elemRef, _),
              Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
            LambdaFunction(finish, Seq(fin: NamedLambdaVariable), _))
          if isFloatingArray(a) && isFloatingArray(b) &&
            isDoubleCastOf(mx, x) && isDoubleCastOf(my, y) &&
            accRef.semanticEquals(acc) && elemRef.semanticEquals(elem) &&
            finish.semanticEquals(fin) =>
        VectorDot(a, b)
    }
}
