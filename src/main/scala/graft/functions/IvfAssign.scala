package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** IVF coarse-quantizer model flattened for kernel consumption: m
  * centroids of `dim` components stored row-major in one double array.
  * Shipped to executors as a Spark broadcast (fetched once per executor)
  * rather than a plan literal — past a few hundred centroids, a
  * typedLit of m struct rows bloats the plan tree and codegen, while
  * the broadcast keeps the plan O(1) regardless of m.
  */
final class IvfModel(val cids: Array[Long], val flat: Array[Double],
    val norms: Array[Double], val dim: Int) extends Serializable {
  def m: Int = cids.length
}

/** Nearest-nprobe centroid assignment against a broadcast quantizer as
  * one codegen'd kernel call: for each vector, cosine vs all m
  * centroids and a bounded insertion-select of the nprobe best by
  * (sim desc, cid asc) — the same total order the literal
  * transform→array_sort→slice path produces (parity asserted in
  * DedupAnnSpec), so the two paths are interchangeable per m.
  */
case class IvfAssignExpr(vec: Expression, nrm: Expression,
    model: Broadcast[IvfModel], nprobe: Int) extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = nrm
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any, n: Any): Any =
    IvfAssign.topProbes(v.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], model.value, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("ivfModelBc", model,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, (v, n) =>
      s"graft.functions.IvfAssign.topProbes($v, $n, " +
        s"(graft.functions.IvfModel) $bcRef.value(), $nprobe)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvfAssignExpr =
    copy(vec = l, nrm = r)
}

object IvfAssign {

  def probes(vec: Column, nrm: Column, model: Broadcast[IvfModel],
      nprobe: Int): Column =
    columnOf(IvfAssignExpr(expressionOf(vec), expressionOf(nrm), model, nprobe))

  /** cids of the nprobe nearest centroids, best first. Tie order
    * matches the literal path: java.lang.Double.compare on -sim, then
    * cid ascending. Dot accumulation is sequential left-to-right —
    * identical to [[VecKernels.dot]] and the oracle's
    * list_dot_product.
    */
  def topProbes(v: ArrayData, nrm: Double, model: IvfModel,
      nprobe: Int): ArrayData = {
    val m = model.m
    val dim = math.min(model.dim, v.numElements())
    val k = math.min(nprobe, m)
    val bestNeg = new Array[Double](k)
    val bestCid = new Array[Long](k)
    var filled = 0
    var c = 0
    while (c < m) {
      var acc = 0.0
      val off = c * model.dim
      var d = 0
      while (d < dim) { acc += v.getDouble(d) * model.flat(off + d); d += 1 }
      val neg = -(acc / (nrm * model.norms(c)))
      val cid = model.cids(c)
      if (filled < k || lt(neg, cid, bestNeg(filled - 1), bestCid(filled - 1))) {
        var i = if (filled < k) filled else k - 1
        while (i > 0 && lt(neg, cid, bestNeg(i - 1), bestCid(i - 1))) {
          bestNeg(i) = bestNeg(i - 1); bestCid(i) = bestCid(i - 1); i -= 1
        }
        bestNeg(i) = neg; bestCid(i) = cid
        if (filled < k) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestCid, filled))
  }

  private def lt(n1: Double, c1: Long, n2: Double, c2: Long): Boolean = {
    val cmp = java.lang.Double.compare(n1, n2)
    cmp < 0 || (cmp == 0 && c1 < c2)
  }
}
