package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal Column ↔ catalyst Expression bridge for graft's custom
  * expressions. Spark 4 Columns wrap ColumnNodes and the conversion
  * utilities are `private[sql]`, so this one-file shim lives in the
  * org.apache.spark.sql package — the conventional extension point for
  * libraries that ship native expressions (no Spark internals are
  * modified).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — the entry point for graft's custom logical
    * nodes (AsOfJoinPlan).
    */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Block until every queued SparkListener event has been delivered —
    * the deterministic replacement for sleep-and-hope when attributing
    * per-query task metrics (`listenerBus` is `private[spark]`, hence
    * here).
    */
  def drainListeners(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
