package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrites the higher-order-function dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x) * CAST(y)), 0.0,
  *               (acc, z) -> acc + z) }}}
  *
  * into the codegen'd [[VectorDot]] expression. Users (and SQL authors)
  * can write the portable HOF form and still get the fused loop — the
  * same accumulation order, so results are identical.
  *
  * Precondition (documented, not checkable statically): inputs are
  * equal-length arrays with non-null elements — embedding-vector
  * semantics. With null elements the HOF form returns null while
  * VectorDot treats the pair as skippable; graft's vector columns never
  * contain null elements.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleCastOf(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case c: Cast => c.dataType == DoubleType && c.child.semanticEquals(v)
      case other => other.semanticEquals(v) && other.dataType == DoubleType
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
          if isDoubleCastOf(mx, x) && isDoubleCastOf(my, y) &&
            accRef.semanticEquals(acc) && elemRef.semanticEquals(elem) &&
            finish.semanticEquals(fin) =>
        VectorDot(a, b)
    }
}
