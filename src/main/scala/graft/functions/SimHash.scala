package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (SURVEY §2 G2).
  *
  * Per token: a 64-bit [[StrHash]] (poly + splitmix64, DuckDB-
  * replicable); each bit votes +1/-1 into 64 counters; the
  * sign vector is the signature. Implemented as a custom Catalyst
  * Expression because the 64-counter inner loop has no efficient
  * built-in composition (an aggregate over zip_with of 64-wide arrays
  * allocates per token). Codegen emits a static kernel call, so the
  * surrounding projection stays in WholeStageCodegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(SimHashKernel.compute(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.compute($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** static kernel referenced from generated code */
object SimHashKernel {
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = StrHash.hash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

object SimHash {
  /** array<string> tokens -> 64-bit simhash signature. */
  def simhash64(tokens: Column): Column = columnOf(SimHash64(expressionOf(tokens)))
}
