package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 routes Column construction through the private[sql]
  * `classic.ExpressionUtils`; a library adding its own expressions
  * (graft.functions.TextHash) needs this one-hop re-export, the same
  * pattern Spark-native extension libraries use. No behavior — just
  * visibility.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
