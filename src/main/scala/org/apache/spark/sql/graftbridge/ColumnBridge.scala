package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the classic converters
  * private[sql], so third-party native expressions need this one-liner
  * inside the org.apache.spark.sql package tree to wrap a Catalyst
  * Expression as a user-facing Column (the Spark 3 `new Column(expr)`
  * constructor is gone).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
