package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for turning a custom [[LogicalPlan]] into a DataFrame.
  *
  * `Dataset.ofRows` is `private[sql]`, so an extension library that
  * defines its own logical operators needs one file in the
  * `org.apache.spark.sql` namespace to reach it — the standard pattern
  * for Spark-native operator libraries. Nothing else lives here; all
  * engine code is under `graft.*`.
  */
object GraftPlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan + resolved output attributes of a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** FULLY OPTIMIZED logical plan of a DataFrame — for plans injected
    * by a late (extraOptimizations-window) rule: the main optimizer
    * batches never re-run on the injected subtree, so operators the
    * optimizer must rewrite before planning (ExceptAll, Intersect)
    * would reach the planner raw and fail. Running the session's own
    * optimizer on the subtree first makes late injection safe.
    */
  def optimized(df: DataFrame): LogicalPlan =
    df.queryExecution.optimizedPlan

  /** Wrap a catalyst Expression as a Column (`ExpressionUtils.column`
    * is `private[sql]`). The SQL-DML layer uses this to carry the
    * analyzer's RESOLVED condition/assignment expressions — exprIds
    * intact — into DataFrame operators over plans that preserve those
    * exprIds, instead of lossily round-tripping through SQL text.
    */
  def column(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The inverse: a Column's catalyst Expression (`expr` is
    * `private[sql]` in the classic split).
    */
  def expression(
      c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Re-tag a batch DataFrame as a STREAMING frame (isStreaming=true)
    * — what a DSv1 [[org.apache.spark.sql.execution.streaming.Source]]
    * must return from `getBatch` (MicroBatchExecution asserts it).
    * Evaluation stays lazy: the streaming frame wraps the batch
    * plan's executed RDD, produced when the micro-batch runs.
    */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse re-tag: wrap a STREAMING micro-batch frame (what a
    * DSv1 [[org.apache.spark.sql.execution.streaming.Sink]] receives
    * in `addBatch`) as a plain batch frame so ordinary writers can
    * consume it — the standard DSv1 sink pattern (a streaming frame
    * refuses batch actions directly).
    */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
