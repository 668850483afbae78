package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression bridge. `ExpressionUtils` is `private[sql]` in
  * Spark 4, so libraries shipping native Catalyst expressions expose
  * them through a shim in the `org.apache.spark.sql` namespace — the
  * established pattern for Spark extension libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly convert a Column to its Catalyst expression.
    * (`ExpressionUtils.expression` returns a lazy ColumnNodeExpression
    * wrapper that is neither matchable nor serializable — the real
    * conversion lives in ColumnNodeToExpressionConverter.) */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — needed to expose custom LogicalPlan operators
    * through a public API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until the async listener bus has delivered every queued
    * event (`SparkContext.listenerBus` is `private[spark]`) — lets a
    * measurement listener read a complete job log instead of racing a
    * fixed sleep against event delivery. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
