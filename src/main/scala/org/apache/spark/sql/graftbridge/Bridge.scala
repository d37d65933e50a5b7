package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal access bridge into Spark's `private[sql]` planner surface
  * (Column→Expression, LogicalPlan→DataFrame, extra strategies) for
  * the engine's custom operators — the same doorway every Spark
  * extension library uses. Keep it tiny: everything engine-specific
  * lives in `graft.plans`.
  */
object Bridge {

  /** Eager conversion: ExpressionUtils.expression returns a lazy
    * ColumnNodeExpression that only analysis of standard Dataset
    * operators unwraps — inside a custom logical node it would reach
    * execution unevaluable. */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)

  /** Reverse direction: wrap an already-built catalyst Expression as
    * a user-facing Column (the classic ExpressionUtils.column, which
    * is private[sql]). */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[CSparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
