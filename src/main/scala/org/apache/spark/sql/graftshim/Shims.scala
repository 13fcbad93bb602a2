package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset, ExpressionUtils}

/** Bridge to `private[sql]` Column↔Expression / plan↔DataFrame
  * converters — the supported way for an external library to wrap custom
  * Catalyst expressions and logical plans on Spark 4 (the classic
  * converters live behind package-private access, so this one-file
  * subpackage is the whole shim). */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  /** EAGER conversion to a catalyst expression tree. The lazy
    * `ExpressionUtils.expression` wrapper (ColumnNodeExpression) keeps a
    * non-serializable ColumnNode inside and is only unwrapped by the
    * Dataset API's own operators — inside a custom LogicalPlan it would
    * survive to execution and fail task serialization. */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
