package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Dot product over two double arrays as a codegen'd kernel call.
  *
  * Replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: higher-order
  * functions evaluate interpreted (per-element Expression.eval + an
  * intermediate array alloc per row). The kernel is one fused loop.
  * FP parity: sequential left-to-right accumulation — identical to
  * both the HOF formulation and DuckDB's list_dot_product, so oracle
  * results stay bit-exact.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket as a kernel (plane coefficients from
  * splitmix64(plane, dim) — deterministic, model-free).
  */
case class HyperplaneBucketExpr(child: Expression, nPlanes: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(
      VecKernels.hyperplaneBucket(v.asInstanceOf[ArrayData], nPlanes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecKernels.hyperplaneBucket($c, $nPlanes)")
  override protected def withNewChildInternal(c: Expression): HyperplaneBucketExpr =
    copy(child = c)
}

object VecKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** coef(p, d) = (splitmix64(p·131 + d) mod 1000 - 500) / 500 —
    * deterministic pseudo-random plane coefficients, no stored model.
    */
  def hyperplaneBucket(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        val m = WinnowFingerprints.mix(p.toLong * 131 + d) % 1000L
        val pm = if (m < 0) m + 1000L else m
        acc += v.getDouble(d) * ((pm - 500L) / 500.0)
        d += 1
      }
      bucket = bucket * 2 + (if (acc >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }
}
