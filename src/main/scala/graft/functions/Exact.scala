package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Engine-portable exact arithmetic.
  *
  * Double summation is order-dependent, and Spark's partial
  * aggregation order differs from any single-node oracle — and from
  * itself run-to-run at 1000 executors. Casting to DECIMAL(12,2)
  * before SUM makes the aggregate exact and order-independent; one
  * final cast to double yields a bit-identical value in any engine.
  * Decimal widths are chosen so products never exceed precision 38
  * in either Spark or DuckDB ((12,2)x(12,2)->(25,4), x(12,2)->(38,6)),
  * so no intermediate rounding ever occurs.
  */
object Exact {
  val Dec: DecimalType = DecimalType(12, 2)

  def dec(c: Column): Column = c.cast(Dec)

  /** SUM(CAST(x AS DECIMAL(12,2))) -> double */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** SUM(dec(a) * dec(b)) -> double */
  def dsum2(a: Column, b: Column): Column = sum(dec(a) * dec(b)).cast(DoubleType)

  /** SUM(dec(a) * dec(b) * dec(c)) -> double */
  def dsum3(a: Column, b: Column, c: Column): Column =
    sum(dec(a) * dec(b) * dec(c)).cast(DoubleType)

  /** Exact mean: decimal sum cast to double, then one IEEE division. */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))

  /** Counts as BIGINT everywhere (DuckDB COUNT/len are BIGINT). */
  def lcount: Column = count(lit(1)).cast(LongType)
}
