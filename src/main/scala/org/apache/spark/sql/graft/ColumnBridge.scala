package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge. Spark 4 made these conversions private[sql],
 * so, like the reference connector (which lives in
 * org.apache.spark.sql.eventhubs for the same reason), we expose the two
 * calls our expression library needs from inside the sql package.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    // eagerly convert the ColumnNode tree: ExpressionUtils.expression wraps
    // it in a lazy ColumnNodeExpression, which is Unevaluable if it ever
    // reaches execution unconverted (e.g. when returned from a SQL
    // FunctionRegistry builder); the converter yields the plain
    // UnresolvedFunction/Expression tree the analyzer resolves normally
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a SQL function on a LIVE session (sessionState is
    * private[sql]; builder-time registration goes through the public
    * SparkSessionExtensions API instead — see graft.GraftExtensions). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)

  /** What the session builder does with `spark.sql.extensions` set: apply
    * registered injections onto the given registries. Exposed (the methods
    * are private[sql]) so the config-path wiring is testable in a JVM whose
    * one SparkContext is already bound to another session. */
  def applyExtensions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      fr: org.apache.spark.sql.catalyst.analysis.FunctionRegistry,
      tfr: org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry): Unit = {
    ext.registerFunctions(fr)
    ext.registerTableFunctions(tfr)
  }

  /** Same live-session seam for TABLE functions (`SELECT * FROM graft_x(...)`);
    * builder-time registration uses SparkSessionExtensions.injectTableFunction. */
  def registerTableFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.registerFunction(name, info, builder)
}
