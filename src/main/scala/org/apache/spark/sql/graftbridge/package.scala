package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column<->Expression converters so
  * graft can expose custom Catalyst expressions as user-facing
  * Columns. Standard extension-library pattern (cf. the public
  * DatasetFactory/ColumnDataset shims in SNIPPETS.md).
  */
package object graftbridge {
  /** Public alias of the private[sql] AbstractDataType so graft
    * expressions can declare ExpectsInputTypes.inputTypes (clean
    * analysis-time type errors instead of runtime ClassCastException).
    */
  type AbstractDT = org.apache.spark.sql.types.AbstractDataType

  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Column -> plain catalyst expression (UnresolvedAttribute etc.),
    * eagerly converted so it is analyzer-resolvable inside custom
    * logical nodes and java-serializable in physical ones (the lazy
    * ColumnNodeExpression wrapper from expressionOf is neither).
    */
  def catalystExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a logical plan as a DataFrame (for custom logical nodes). */
  def datasetOfRows(spark: classic.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
