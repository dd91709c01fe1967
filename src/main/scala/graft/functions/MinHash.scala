package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf, AbstractDT}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** mod-2^64 polynomial string hash (base 1000003) + splitmix64
  * finalizer — the SAME arithmetic the winnow kernel uses, chosen so
  * every consumer (minhash, simhash) is replicable in the DuckDB
  * oracle's HUGEINT SQL (a Murmur3 kernel would be correct but
  * unverifiable there).
  */
object StrHash {
  def hash64(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) { acc = acc * 1000003L + (s.getByte(i) & 0xFF); i += 1 }
    WinnowFingerprints.mix(acc)
  }

  /** Column face of [[hash64]] — a single codegen'd long per string. */
  def strhash64(c: Column): Column = columnOf(StrHash64(expressionOf(c)))
}

/** Scalar 64-bit string hash column ([[StrHash.hash64]]): poly fold
  * base 1000003 mod 2^64 + splitmix64 finalizer. Used as the window
  * fingerprint in substring-level dedup (DedupOps.dedupSubstring) and
  * exposed in SQL as `graft_strhash64`. Oracle-replicable with the
  * same HUGEINT fragments as the minhash/simhash kernels.
  */
case class StrHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  // declared input type => graft_strhash64(123) from SQL is a clean
  // analysis-time error (not a runtime ClassCastException in eval)
  override def inputTypes: Seq[AbstractDT] = Seq(StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    StrHash.hash64(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StrHash.hash64($c)")

  override protected def withNewChildInternal(c: Expression): StrHash64 =
    copy(child = c)
}

/** MinHash signature as a single custom expression: hash each shingle
  * once ([[StrHash]] 64-bit), then apply k affine permutations
  * h_i = a_i*h + b_i (odd multipliers from splitmix64, fixed seed)
  * keeping running minima — one tight k×n loop instead of k
  * interpreted re-hashes of every shingle (the built-in HOF
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
        val h = StrHash.hash64(arr.getUTF8String(i))
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
