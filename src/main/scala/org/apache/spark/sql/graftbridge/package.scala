package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column<->Expression converters so
  * graft can expose custom Catalyst expressions as user-facing
  * Columns. Standard extension-library pattern (cf. the public
  * DatasetFactory/ColumnDataset shims in SNIPPETS.md).
  */
package object graftbridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
