// Lives in org.apache.spark.sql to reach the private[sql] Column↔Expression
// converters — the sanctioned extension seam for libraries adding native
// expressions (same technique as spark-connector libraries).
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Column → fully-converted CATALYST expression (UnresolvedAttribute /
    * SortOrder with catalyst children) — `expression(c)` returns a lazy
    * ColumnNode wrapper that is neither resolvable by generic rules nor
    * serializable; this converter is what the classic Dataset API itself
    * uses. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** DataFrame from a custom logical plan (Dataset.ofRows is private[sql]). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
