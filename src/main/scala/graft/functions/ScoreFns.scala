package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf, AbstractDT}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** The RATIONAL retrieval scores (SURVEY §2 D31/D32/D34) as codegen'd
  * scalar expressions: integer cross products with ONE exactly-rounded
  * double division, so values and orderings are bit-reproducible on
  * any engine — log-idf is not (libm log differs across platforms in
  * ULPs, and float sums of logs are order-dependent). Registered as
  * SQL functions (graft_tfidf / graft_pmi / graft_bm25_idf) via
  * [[graft.plans.GraftExtensions]] and used by the TextOps operators
  * themselves, so the SQL surface and the Scala API cannot drift.
  */
object ScoreFns {
  /** tf-idf with rational idf: (tf · nDocs) / df. */
  def tfidf(tf: Column, df: Column, nDocs: Column): Column =
    columnOf(TfIdfScore(expressionOf(tf), expressionOf(df), expressionOf(nDocs)))

  /** Pointwise association: (cAb · nTokens) / (cA · cB). */
  def pmi(cAb: Column, cA: Column, cB: Column, nTokens: Column): Column =
    columnOf(PmiScore(expressionOf(cAb), expressionOf(cA), expressionOf(cB),
      expressionOf(nTokens)))

  /** BM25's idf term, rational form: (nDocs − df + ½) / (df + ½). */
  def bm25Idf(nDocs: Column, df: Column): Column =
    columnOf(Bm25Idf(expressionOf(nDocs), expressionOf(df)))
}

/** Overflow-safe integer kernels backing the score expressions (and
  * their codegen — called through the static forwarders like the other
  * graft kernels). The cross products are mathematically 128-bit:
  * PMI's ca·cb reaches ~10²⁴ at the 100 TB design point (~2×10¹³
  * tokens, common-token counts ~10¹²), past Long's 9.2×10¹⁸, and a
  * silent wrap would produce garbage scores with no error. The Long
  * fast path covers every product that fits (detected with
  * Math.multiplyHigh — one extra multiply, branch-predictable); the
  * BigInteger fallback is correctly rounded to double, which is
  * exactly what an external engine's HUGEINT→DOUBLE cast computes, so
  * the oracle contract survives the widening. TfIdf's tf·nDocs is
  * bounded ≈ 10¹⁶ at the same design point (a doc's term frequency
  * ≤ ~10⁵ · nDocs ≤ ~10¹¹ would overflow too on adversarial inputs),
  * so it routes through the same guard.
  */
object ScoreMath {
  /** (a·b) as the correctly-rounded double of the EXACT 128-bit
    * product — Long fast path when it fits.
    */
  def prodToDouble(a: Long, b: Long): Double = {
    val lo = a * b
    if (Math.multiplyHigh(a, b) == (lo >> 63)) lo.toDouble
    else java.math.BigInteger.valueOf(a)
      .multiply(java.math.BigInteger.valueOf(b)).doubleValue()
  }
  def tfidf(tf: Long, df: Long, n: Long): Double =
    prodToDouble(tf, n) / df.toDouble
  def pmi(cab: Long, ca: Long, cb: Long, n: Long): Double =
    prodToDouble(cab, n) / prodToDouble(ca, cb)
}

case class TfIdfScore(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDT] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(tf: Any, df: Any, n: Any): Any =
    ScoreMath.tfidf(tf.asInstanceOf[Long], df.asInstanceOf[Long],
      n.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (tf, df, n) =>
      s"graft.functions.ScoreMath.tfidf($tf, $df, $n)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): TfIdfScore = copy(first = a, second = b, third = c)
}

case class PmiScore(first: Expression, second: Expression, third: Expression,
    fourth: Expression) extends QuaternaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDT] =
    Seq(LongType, LongType, LongType, LongType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(cab: Any, ca: Any, cb: Any, n: Any): Any =
    ScoreMath.pmi(cab.asInstanceOf[Long], ca.asInstanceOf[Long],
      cb.asInstanceOf[Long], n.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (cab, ca, cb, n) =>
      s"graft.functions.ScoreMath.pmi($cab, $ca, $cb, $n)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): PmiScore =
    copy(first = a, second = b, third = c, fourth = d)
}

case class Bm25Idf(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDT] = Seq(LongType, LongType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(n: Any, df: Any): Any = {
    val nd = n.asInstanceOf[Long]; val d = df.asInstanceOf[Long]
    ((nd - d).toDouble + 0.5) / (d.toDouble + 0.5)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, df) =>
      s"(((double)($n - $df)) + 0.5d) / (((double)$df) + 0.5d)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Bm25Idf = copy(left = l, right = r)
}
