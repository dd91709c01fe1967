package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Gzip compress as a native Catalyst expression: full codegen via a
  * static call into [[GzipCodec]] — no UDF serialization overhead, and
  * the surrounding project/filter stays in one WholeStageCodegen span.
  */
case class GzipCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    GzipCodec.gzip(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipCodec.gzip($c)")
  override protected def withNewChildInternal(c: Expression): GzipCompress = copy(c)
}

case class GzipDecompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    GzipCodec.gunzip(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipCodec.gunzip($c)")
  override protected def withNewChildInternal(c: Expression): GzipDecompress = copy(c)
}

/** GBK -> UTF-8 string decode (handler/handler.go:48-56 GBKToUTF8):
  * Spark 4's decode() restricts charsets to a unicode-only list, so
  * archive entry names written by Windows tools need this expression.
  * Codegen'd via static call like the gzip pair.
  */
case class GbkDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override protected def nullSafeEval(v: Any): Any =
    ContentFns.gbkToUtf8String(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ContentFns.gbkToUtf8String($c)")
  override protected def withNewChildInternal(c: Expression): GbkDecode = copy(c)
}

/** Content-policy column functions (checksum / compression policy),
  * mirroring handler/kafka.go:272-300 and lib/compress/compress.go.
  */
object ContentFns {
  def gbkToUtf8String(b: Array[Byte]): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(new String(b, "GBK"))

  /** binary (GBK bytes) -> string column. */
  def gbkDecode(c: Column): Column = columnOf(GbkDecode(expressionOf(c)))
  def gzipCompress(c: Column): Column = columnOf(GzipCompress(expressionOf(c)))
  def gzipDecompress(c: Column): Column = columnOf(GzipDecompress(expressionOf(c)))

  /** md5 hex checksum of string content (engine-portable). */
  def checksum(text: Column): Column = md5(text)

  /** compress.go policy: size > 1KiB and ext not already compressed. */
  def shouldCompress(size: Column, ext: Column): Column =
    (size > GzipCodec.GzipMinLength) && !ext.rlike(GzipCodec.NoCompressExt)

  /** compress_size semantics: original size when not compressed. */
  def compressSize(compress: Column, size: Column, gzSize: Column): Column =
    when(compress, gzSize).otherwise(size).cast(LongType)
}
