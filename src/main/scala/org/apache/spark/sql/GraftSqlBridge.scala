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

  /** The session's autoBroadcastJoinThreshold in bytes (-1 = broadcast
    * disabled), already parsed by SQLConf — size-adaptive operators
    * compare their own estimates against it. */
  def autoBroadcastThreshold(spark: SparkSession): Long =
    spark.sessionState.conf.autoBroadcastJoinThreshold

  /** A DataFrame over an already-analyzed logical plan (Dataset.ofRows
    * is private[sql]) — used by the CtePin prototype to execute a CTE
    * def body it extracted during analysis. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The persisted RDD behind a checkpointed/pinned DataFrame — lets
    * iterative operators release superseded rounds DETERMINISTICALLY
    * instead of waiting for the ContextCleaner's GC-driven reaping.
    * Deliberately matches ONLY a frame that IS a bare pin (the direct
    * result of localCheckpoint/checkpoint): digging for a LogicalRDD
    * nested under projections could release a pinned SOURCE some
    * caller still needs through a derived frame. */
  def pinnedRddOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD => Some(r.rdd)
      case _ => None
    }
}
