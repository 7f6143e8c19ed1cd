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
  import GraftExtensions.requireArity

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        requireArity("vec_dot", "vec_dot(a, b)", 2, exprs)
        VectorDot(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => {
        requireArity("jaro_winkler", "jaro_winkler(a, b)", 2, exprs)
        JaroWinkler(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName,
        "nfc_normalize"),
      (exprs: Seq[Expression]) => {
        requireArity("nfc_normalize", "nfc_normalize(s)", 1, exprs)
        graft.functions.NfcNormalize(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_window_hashes"),
      new ExpressionInfo(classOf[graft.functions.RollingWindowHashes].getName,
        "rolling_window_hashes"),
      (exprs: Seq[Expression]) => {
        val usage = "rolling_window_hashes(text, windowLen)"
        requireArity("rolling_window_hashes", usage, 2, exprs)
        // integral-literal only: the window length parameterizes the
        // expression itself (it is not a runtime child), so a column or
        // fractional literal is a usage error, reported as one
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _)
              if v >= Int.MinValue && v <= Int.MaxValue => v.toInt
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Short, _) => v.toInt
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Byte, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"$usage: windowLen must be an integer literal, got $other")
        }
        graft.functions.RollingWindowHashes(exprs(0), k)
      }))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}

object GraftExtensions {
  /** Loud usage error for wrong function arity — SQL callers otherwise
    * see a raw `IndexOutOfBoundsException` from `exprs(1)`. */
  private def requireArity(name: String, usage: String, n: Int,
      exprs: Seq[Expression]): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments but got ${exprs.length}; usage: $usage")
}
