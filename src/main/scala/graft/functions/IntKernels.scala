package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf, AbstractDT}
import org.apache.spark.sql.types.{DataType, LongType}

/** Small integer kernels shared by the export-manifest and LM-scoring
  * operators (SURVEY §2 D37/D38). Both are codegen'd scalar
  * expressions with exact DuckDB replications (HUGEINT wraparound /
  * bin()+shift fragments in SparkEntry), keeping the oracle contract
  * hash-exact. Plain `Column` arithmetic cannot express them under
  * Spark 4's default ANSI mode: splitmix's multiplies MUST wrap
  * mod 2⁶⁴, which ANSI turns into an overflow error.
  */
object IntKernels {
  /** splitmix64 finalizer of a long — the repo's standard avalanche
    * (same constants as [[WinnowFingerprints.mix]]): deterministic
    * shard assignment and order-independent content checksums.
    */
  def mix64(x: Column): Column = columnOf(Mix64(expressionOf(x)))

  /** Monotone integer log2 in Q10 fixed point:
    * q(n) = bl·1024 + ((n<<10) >>> bl) − 1024, bl = floor(log2 n),
    * for n ≥ 1 — a linear-in-mantissa approximation of 1024·log2(n)
    * computed entirely in integer ops, so any engine reproduces it
    * bit-for-bit (libm log does not: cross-platform ULP drift, and a
    * float sum of logs is order-dependent). Exact at powers of two;
    * error < 0.09 bits elsewhere; defined for n up to 2⁵³ (the shift
    * must not drop mantissa bits — corpus token counts at the 100 TB
    * design point are ~2×10¹³, five orders below the bound).
    */
  def qlog2(n: Column): Column = columnOf(QLog2(expressionOf(n)))
}

/** Static forwarders for codegen (house pattern, cf. [[ScoreMath]]). */
object IntMath {
  def mix64(x: Long): Long = WinnowFingerprints.mix(x)
  def qlog2(n: Long): Long = {
    require(n >= 1, s"qlog2 domain is n >= 1, got $n")
    val bl = 63 - java.lang.Long.numberOfLeadingZeros(n)
    (bl.toLong << 10) + ((n << 10) >>> bl) - 1024L
  }
}

case class Mix64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDT] = Seq(LongType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any): Any =
    IntMath.mix64(x.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.IntMath.mix64($x)")
  override protected def withNewChildInternal(c: Expression): Mix64 =
    copy(child = c)
}

case class QLog2(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDT] = Seq(LongType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any): Any =
    IntMath.qlog2(x.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.IntMath.qlog2($x)")
  override protected def withNewChildInternal(c: Expression): QLog2 =
    copy(child = c)
}
