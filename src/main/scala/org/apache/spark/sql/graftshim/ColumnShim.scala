package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 made Column ↔ Expression conversion private[sql];
  * this shim lives in a subpackage of org.apache.spark.sql solely to
  * re-export the two conversions (the supported alternative — registering
  * through SparkSessionExtensions — requires controlling session
  * construction, which a library embedded in a host session does not). */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
