package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 hides the conversion behind
  * `private[sql] classic.ExpressionUtils`; custom Catalyst expressions
  * (graft.functions) need it, so this shim lives under the sql package —
  * the standard pattern for Spark extension libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
