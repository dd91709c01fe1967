package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf, AbstractDT}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All length-L token-window fingerprints of a token array in ONE
  * codegen'd kernel pass (SURVEY §2 G8; used by substring-level dedup,
  * DedupOps.dedupSubstring).
  *
  * Semantics: element s (0-based) equals
  * `StrHash.hash64(toks[s] + " " + … + " " + toks[s+L-1])` — the poly
  * fold base 1000003 mod 2^64 over the space-joined window bytes,
  * splitmix64-finalized — so the DuckDB HUGEINT oracle fragments that
  * replicate StrHash stay valid verbatim.
  *
  * Null elements hash as EMPTY STRINGS with their separators retained
  * (a null token folds as fold=0/pow=1, i.e. `[a, null, b]` hashes as
  * `"a" + " " + "" + " " + "b"`). This intentionally differs from
  * `concat_ws`, which would drop the null AND its separator — under
  * concat_ws semantics `[a, null, b]` and `[a, b, null]` would
  * collide as windows even though the token positions differ, which
  * is wrong for positional window dedup. Internal callers only feed
  * `split()` output (never null); the SQL surface
  * (`graft_window_hashes`) follows the documented null-as-empty rule,
  * pinned by a spec test.
  *
  * Why a kernel: the equivalent built-in formulation
  * (`transform(sequence(…), i -> strhash64(concat_ws(" ",
  * slice(toks, i+1, L))))`) allocates a sliced array + a concatenated
  * UTF8String per window and evaluates the lambda interpreted
  * (CodegenFallback); worse, Catalyst's inferred join-key constraints
  * re-derive the whole chain per join branch. Here each token is
  * byte-folded ONCE (prefix value + byte-length power), and each
  * window folds L precomputed (pow, fold) pairs — O(bytes + n·L) long
  * arithmetic, zero allocation per window, inside WholeStageCodegen.
  */
case class WindowHashes(child: Expression, windowLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(windowLen >= 1)
  override def inputTypes: Seq[AbstractDT] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    WindowHashKernel.compute(v.asInstanceOf[ArrayData], windowLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WindowHashKernel.compute($c, $windowLen)")

  override protected def withNewChildInternal(c: Expression): WindowHashes =
    copy(child = c)
}

/** static kernel referenced from generated code */
object WindowHashKernel {
  private final val Base = WinnowFingerprints.Base // 1000003

  def compute(arr: ArrayData, l: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n < l) return new GenericArrayData(Array.empty[Long])
    // per-token prefold: fold(t) = poly fold of t's bytes from acc=0,
    // pow(t) = Base^numBytes(t) mod 2^64 — so appending token t to an
    // accumulator is acc*pow(t) + fold(t) (mod 2^64 via Long overflow)
    val fold = new Array[Long](n)
    val pow = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var p = 1L
      if (!arr.isNullAt(i)) {
        val t: UTF8String = arr.getUTF8String(i)
        val m = t.numBytes()
        var b = 0
        while (b < m) {
          acc = acc * Base + (t.getByte(b) & 0xFF)
          p *= Base
          b += 1
        }
      }
      fold(i) = acc; pow(i) = p
      i += 1
    }
    val out = new Array[Long](n - l + 1)
    var s = 0
    while (s <= n - l) {
      var acc = 0L
      var j = 0
      while (j < l) {
        val k = s + j
        acc = acc * pow(k) + fold(k)
        if (j < l - 1) acc = acc * Base + 32L // ' ' separator
        j += 1
      }
      out(s) = WinnowFingerprints.mix(acc)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** array<string> tokens -> array<long> of L-window fingerprints. */
  def windowHashes(toks: Column, l: Int): Column =
    columnOf(WindowHashes(expressionOf(toks), l))
}

/** The dedup ACTION for substring-level dedup: rebuild a document's
  * text with every token covered by a duplicated L-window removed.
  * `starts` is the doc's sorted duplicated-window start list; coverage
  * is the interval union of [s, s+L) walked with one pointer — O(n+m)
  * per doc, zero allocation beyond the kept-token array, codegen'd so
  * the scrub stays inside WholeStageCodegen.
  */
case class RemoveSpans(left: Expression, right: Expression, windowLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  require(windowLen >= 1)
  override def inputTypes: Seq[AbstractDT] =
    Seq(ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = StringType

  override protected def nullSafeEval(toks: Any, starts: Any): Any =
    SpanScrubKernel.remove(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], windowLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.functions.SpanScrubKernel.remove($t, $s, $windowLen)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): RemoveSpans = copy(left = l, right = r)
}

/** static kernel referenced from generated code */
object SpanScrubKernel {
  private val Space = UTF8String.fromString(" ")

  def remove(toks: ArrayData, starts: ArrayData, l: Int): UTF8String = {
    val n = toks.numElements()
    val m = starts.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var idx = 0
    var coveredUntil = -1L
    var pos = 0
    while (pos < n) {
      while (idx < m && starts.getLong(idx) <= pos) {
        val end = starts.getLong(idx) + l
        if (end > coveredUntil) coveredUntil = end
        idx += 1
      }
      if (pos >= coveredUntil)
        kept.add(if (toks.isNullAt(pos)) UTF8String.EMPTY_UTF8
          else toks.getUTF8String(pos))
      pos += 1
    }
    UTF8String.concatWs(Space, kept.toArray(new Array[UTF8String](kept.size)): _*)
  }

  /** (tokens, sorted dup-window starts) -> scrubbed text. */
  def removeSpans(toks: Column, starts: Column, l: Int): Column =
    columnOf(RemoveSpans(expressionOf(toks), expressionOf(starts), l))
}
