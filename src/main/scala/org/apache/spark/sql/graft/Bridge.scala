package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 moved `Column` to sql-api and made
  * the expression accessors `private[sql]`, so extension libraries that
  * define native Catalyst expressions compile this one forwarding object
  * into the sql package namespace — the accepted extension-point pattern
  * (same technique Spark connector projects use). Nothing else in graft
  * lives outside its own namespace. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** [[org.apache.spark.sql.types.AbstractDataType]] is `private[sql]`,
    * but `ExpectsInputTypes.inputTypes` (the analysis-time type contract
    * every well-behaved expression should declare) is typed in terms of
    * it — alias it here so graft expressions can override `inputTypes`
    * from their own namespace. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Analyze + wrap a logical plan into a DataFrame at execution time —
    * the hook graft's SQL DML commands use to resolve an INSERT/MERGE
    * source subquery against the session's catalog when the command runs
    * (temp views included), not when the statement was parsed. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
