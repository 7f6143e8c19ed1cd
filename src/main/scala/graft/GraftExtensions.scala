package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{JaroWinkler, RewriteHofDotProduct, VectorDot}

/** SparkSessionExtensions hook: registers graft's custom Catalyst
  * expressions as SQL functions (`vec_dot`) and the optimizer rule that
  * rewrites the portable higher-order-function dot-product idiom into the
  * codegen'd expression. Attach with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("rolling_window_hashes"),
      new ExpressionInfo(classOf[graft.functions.RollingWindowHashes].getName,
        "rolling_window_hashes"),
      (exprs: Seq[Expression]) => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null => v.toString.toInt
          case other => throw new IllegalArgumentException(
            "rolling_window_hashes(text, windowLen): windowLen must be " +
              s"an integer literal, got $other")
        }
        graft.functions.RollingWindowHashes(exprs.head, k)
      }))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
