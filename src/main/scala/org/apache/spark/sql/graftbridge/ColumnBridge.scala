package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters — the standard
  * idiom for libraries that ship native Catalyst expressions (the public
  * Column API deliberately hides Expression since Spark 4's Connect split).
  * Kept to two one-line forwarders so the private-API surface we touch is
  * minimal and auditable.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
