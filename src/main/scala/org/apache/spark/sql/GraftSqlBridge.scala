package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into private[sql] helpers for building Columns from custom
  * Catalyst expressions (the supported pattern for native extensions:
  * live inside the sql package like every Spark connector/extension
  * does). Keep this file minimal — only plumbing, no logic. */
object GraftSqlBridge {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression under a SQL function name. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
