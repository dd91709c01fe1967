package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** MinHash signature as a single custom expression: hash each shingle
  * once (murmur3 64-bit from two seeds), then apply k affine
  * permutations h_i = a_i*h + b_i (odd multipliers from splitmix64,
  * fixed seed) keeping running minima — one tight k×n loop instead of
  * k interpreted re-hashes of every shingle (the built-in HOF
  * formulation this replaces spent ~9s at sf0.1; this is ~100ms).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    MinHashKernel.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel.compute($c, $k)")

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** static kernel referenced from generated code */
object MinHashKernel {
  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x12345678)
        val h2 = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x87654321)
        val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var j = 0
        while (j < k) {
          val p = MinHashSignature.mult(j) * h + MinHashSignature.add(j)
          if (p < mins(j)) mins(j) = p
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHashSignature {
  private val MaxK = 256
  /** deterministic odd multipliers / offsets (splitmix64 of slot idx) */
  private[functions] val mult: Array[Long] =
    Array.tabulate(MaxK)(i => WinnowFingerprints.mix(i.toLong * 2 + 1) | 1L)
  private[functions] val add: Array[Long] =
    Array.tabulate(MaxK)(i => WinnowFingerprints.mix(0x5deece66dL + i))

  def minhash(shingles: Column, k: Int): Column =
    columnOf(MinHashSignature(expressionOf(shingles), k))
}
