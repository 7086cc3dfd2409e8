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

  /** Build a DataFrame from a custom LogicalPlan (classic.Dataset.ofRows
    * is private[sql]). */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session's ExperimentalMethods (extraStrategies hook). */
  def experimental(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.ExperimentalMethods =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental

  /** Parse SQL text into an (unresolved) LogicalPlan on a live session
    * (`sessionState` is private[sql]; same visibility hop as above). */
  def parsePlan(
      spark: org.apache.spark.sql.SparkSession,
      sqlText: String)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parsePlan(sqlText)

  /** Run the session's analyzer over a plan (resolution only — no
    * optimization, no execution). */
  def analyze(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.executePlan(plan).analyzed

  /** The session's SessionCatalog (catalog-table metadata lookups and
    * the ALTER-side schema update; `sessionState` is private[sql] —
    * same visibility hop as above). */
  def sessionCatalog(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.catalog.SessionCatalog =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog

  /** Register a function builder on a live session's FunctionRegistry
    * (`sessionState` is private[sql]; same visibility hop as above). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
