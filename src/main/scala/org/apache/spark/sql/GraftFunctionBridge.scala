package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into the session function registry (private[sql]) so graft's
  * native expressions can also be installed on caller-provided sessions
  * that were built without `spark.sql.extensions=graft.GraftExtensions`.
  * Isolated here so the rest of the codebase stays on public API. */
object GraftFunctionBridge {
  def register(
      spark: SparkSession,
      id: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
