package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x moved the `Column`↔`Expression` conversions behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * This tiny shim lives in the `org.apache.spark.sql` package solely to
  * re-export those two conversions for graft's custom Catalyst expressions
  * (e.g. the vector-similarity expression in `graft.functions.Vectors`).
  */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
