package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]`).
  * The one-file-in-spark-namespace shim is the established pattern for
  * Catalyst extensions that expose custom expressions as `Column`s.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a hand-constructed logical plan
    * (`classic.Dataset.ofRows` is `private[sql]`).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The planner strategies an extensions class would inject
    * (`SparkSessionExtensions.buildPlannerStrategies` is
    * `private[sql]`) — lets tests assert injection wiring without
    * booting a second SparkSession.
    */
  def plannerStrategies(ext: SparkSessionExtensions,
                        spark: SparkSession): Seq[execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])

  /** Executor-side memory page size for external sorters
    * (`SparkEnv.memoryManager` is `private[spark]`). Callable inside a
    * task closure — `SparkEnv.get` resolves per-JVM.
    */
  def pageSizeBytes: Long =
    org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes

  /** SQL metric factory for custom physical operators. */
  def createMetric(sc: org.apache.spark.SparkContext,
                   name: String): execution.metric.SQLMetric =
    execution.metric.SQLMetrics.createMetric(sc, name)
}
