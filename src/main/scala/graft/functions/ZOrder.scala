package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf, AbstractDT}
import org.apache.spark.sql.types.{DataType, DataTypes, LongType}

/** Morton (Z-order) bit interleaving — the multi-dimensional
  * clustering key behind lakehouse data skipping (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`): sorting by the interleaved key keeps rows
  * close in EVERY dimension close on disk, so per-file/per-partition
  * min-max envelopes stay tight on BOTH columns and a 2-D rectangle
  * predicate prunes most of the file list — a single-column sort can
  * only do that for its leading column.
  *
  * [[ZMath.interleave]] is the shared kernel (operator, codegen, and
  * driver-side cover enumeration all call it); the expression is a
  * codegen'd scalar so layout builds never leave whole-stage codegen.
  */
object ZOrderFns {
  /** Interleaved z-value of two cell coordinates (each in [0, 2³¹)). */
  def zInterleave(x: Column, y: Column): Column =
    columnOf(ZInterleave(expressionOf(x), expressionOf(y)))
}

object ZMath {
  /** Spread the low 32 bits of v to the even bit positions. */
  private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    (v | (v << 1)) & 0x5555555555555555L
  }

  /** z = x's bits on even positions, y's on odd. Inputs must fit in
    * 31 bits so z stays non-negative; out-of-range coordinates are a
    * caller bug and fail loudly rather than silently aliasing cells.
    */
  def interleave(x: Long, y: Long): Long = {
    if (((x | y) & ~0x7FFFFFFFL) != 0L)
      throw new IllegalArgumentException(
        s"z-order cell out of 31-bit range: ($x, $y)")
    spread(x) | (spread(y) << 1)
  }

  /** Inverse of [[interleave]]: (x, y) from a z-value. */
  def deinterleave(z: Long): (Long, Long) = {
    def unspread(v0: Long): Long = {
      var v = v0 & 0x5555555555555555L
      v = (v | (v >> 1)) & 0x3333333333333333L
      v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FF00FF00FFL
      v = (v | (v >> 8)) & 0x0000FFFF0000FFFFL
      (v | (v >> 16)) & 0xFFFFFFFFL
    }
    (unspread(z), unspread(z >> 1))
  }
}

/** Scalar z-value: interleave(x, y), codegen'd via the shared kernel. */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDT] = Seq(LongType, LongType)
  override def dataType: DataType = DataTypes.LongType
  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZMath.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZMath.interleave($x, $y)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ZInterleave = copy(left = l, right = r)
}
