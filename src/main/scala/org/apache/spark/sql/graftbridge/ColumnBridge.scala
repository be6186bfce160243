package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4
  * moved them behind `org.apache.spark.sql.classic.ExpressionUtils`).
  * Lives under the spark.sql package solely to satisfy the access
  * qualifier; the engine's custom Catalyst expressions are wrapped into
  * `Column`s through here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
