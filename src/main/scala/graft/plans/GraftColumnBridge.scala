// Lives in org.apache.spark.sql to reach the private[sql] Column↔Expression
// converters — the sanctioned extension seam for libraries adding native
// expressions (same technique as spark-connector libraries).
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
