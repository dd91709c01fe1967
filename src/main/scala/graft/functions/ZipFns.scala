package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Archive expansion as a Catalyst expression (r12 — the repo's last
  * two Scala UDFs replaced for kernel consistency with the gzip pair,
  * ContentFns.scala:14): one static-call inflate per archive, result
  * delivered in Catalyst internal format.
  */
case class ZipEntriesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ZipFns.EntrySchema
  override protected def nullSafeEval(v: Any): Any =
    ZipFns.zipEntriesCatalyst(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ZipFns.zipEntriesCatalyst($c)")
  override protected def withNewChildInternal(c: Expression): ZipEntriesExpr =
    copy(c)
}

/** (name, content) → deterministic single-entry zip + fixed manifest
  * entry, as a codegen'd expression (see [[ZipEntriesExpr]]).
  */
case class ZipCreate2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(n: Any, c: Any): Any =
    ZipFns.zipCreate2Kernel(n.asInstanceOf[UTF8String],
      c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (n, c) => s"graft.functions.ZipFns.zipCreate2Kernel($n, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : ZipCreate2 = copy(l, r)
}

/** Zip-archive expansion (handler/kafka.go:210-270): one record per
  * non-directory entry; entry names that aren't valid UTF-8 are
  * decoded as GBK (handler/kafka.go:234-241 via handler.go:48-56
  * GBKToUTF8) — Windows tools write simplified-Chinese entry names in
  * GBK without the zip UTF-8 flag.
  */
object ZipFns {

  case class Entry(name: String, content: Array[Byte], size: Long)

  /** Raw-bytes name decode — EXACTLY the reference's rule
    * (kafka.go:234-241): bytes that are valid UTF-8 stay UTF-8
    * (covers both UTF-8-flagged entries and unflagged names that
    * happen to be UTF-8), anything else decodes as GBK.
    */
  private[graft] def decodeEntryName(bytes: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
    try { dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString }
    catch { case _: java.nio.charset.CharacterCodingException =>
      new String(bytes, "GBK") }
  }

  /** Raw entry-name bytes in local-entry order, read from the zip
    * CENTRAL DIRECTORY — java.util.zip insists on decoding names
    * itself (and its UTF-8 coder throws on GBK bytes), so the only
    * way to apply the reference's bytes-based rule is to walk the
    * central directory records: EOCD (sig 0x06054b50, scanned from
    * the tail) → record chain (sig 0x02014b50, name bytes at +46),
    * ordered by each record's local-header offset.
    *
    * Zip64 (APPNOTE 4.3.14/4.5.3) is handled positively: a VALIDATED
    * locator (sig 0x07064b50 twenty bytes before the EOCD, whose u64
    * offset lands on a 0x06064b50 record) routes entry count and
    * CD offset through the zip64 EOCD record, and a CD record whose
    * 32-bit local-header offset is saturated reads the u64 from its
    * 0x0001 extra field (skipping the u64s of whichever size fields
    * are saturated, in APPNOTE order). A locator-sig byte coincidence
    * with no real record behind it falls back to the classic path;
    * saturated sentinels with NO locator, or a truncated/out-of-range
    * zip64 structure, still fail loudly — silently mis-walking the
    * directory would mojibake every name after the break.
    */
  private def rawNames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
    def u64(o: Int): Long = u32(o) | (u32(o + 4) << 32)
    var e = bytes.length - 22 // min EOCD size; scan back over any comment
    while (e >= 0 && !(bytes(e) == 0x50 && bytes(e + 1) == 0x4B &&
      bytes(e + 2) == 0x05 && bytes(e + 3) == 0x06)) e -= 1
    if (e < 0) return IndexedSeq.empty // not a zip; reader will error out
    var count: Long = u16(e + 10)
    var cdOff: Long = u32(e + 16)
    // locator validation: the sig alone could be a coincidence in the
    // preceding record's bytes, so follow its offset (high half must
    // be 0 for an in-memory archive) to the record signature
    val z64At: Option[Int] =
      if (e >= 20 && u32(e - 20) == 0x07064B50L && u32(e - 8) == 0L &&
          u32(e - 12) + 4 <= bytes.length &&
          u32(u32(e - 12).toInt) == 0x06064B50L)
        Some(u32(e - 12).toInt)
      else None
    z64At match {
      case Some(z) =>
        if (z + 56 > bytes.length)
          throw new UnsupportedOperationException(
            "zip64 EOCD record truncated")
        count = u64(z + 32) // total entry count (u64)
        cdOff = u64(z + 48) // central directory offset (u64)
        if ((cdOff >> 32) != 0 || cdOff > bytes.length)
          throw new UnsupportedOperationException(
            "zip64 central-directory offset beyond the in-memory archive")
      case None =>
        if (cdOff == 0xFFFFFFFFL)
          throw new UnsupportedOperationException(
            "zip64 central-directory offset sentinel without a zip64 " +
            "EOCD locator (corrupt archive)")
        // 0xFFFF is a sentinel only when zip64 structures exist; a
        // classic archive with exactly 65535 entries writes it
        // literally. Walk the central directory by signature instead
        // of trusting the count — the loop below is already bounded
        // by the 0x02014B50 record signature check.
        if (count == 0xFFFF) count = Long.MaxValue
    }
    var p = cdOff.toInt // central directory offset
    val recs = IndexedSeq.newBuilder[(Long, Array[Byte])]
    var i = 0L
    while (i < count && p + 46 <= bytes.length && u32(p) == 0x02014B50L) {
      val nameLen = u16(p + 28)
      val extraLen = u16(p + 30)
      var off = u32(p + 42) // local header offset = local entry order
      if (off == 0xFFFFFFFFL) {
        // u64 offset lives in the 0x0001 extra field, after the u64s
        // of whichever size fields are saturated (APPNOTE order:
        // uncompressed size, compressed size, local-header offset)
        var q = p + 46 + nameLen
        val qEnd = q + extraLen
        var found = false
        while (!found && q + 4 <= qEnd) {
          val id = u16(q); val sz = u16(q + 2)
          if (id == 0x0001) {
            var r = q + 4
            if (u32(p + 24) == 0xFFFFFFFFL) r += 8 // uncompressed size
            if (u32(p + 20) == 0xFFFFFFFFL) r += 8 // compressed size
            if (r + 8 <= q + 4 + sz) { off = u64(r); found = true }
          }
          q += 4 + sz
        }
        if (!found || (off >> 32) != 0)
          throw new UnsupportedOperationException(
            "zip64 local-header offset missing or beyond the in-memory archive")
      }
      recs += ((off,
        java.util.Arrays.copyOfRange(bytes, p + 46, p + 46 + nameLen)))
      p += 46 + nameLen + extraLen + u16(p + 32)
      i += 1
    }
    recs.result().sortBy(_._1).map(_._2)
  }

  /** Entry names per local entry, resolved to reference semantics. */
  private def resolveNames(bytes: Array[Byte]): IndexedSeq[String] =
    rawNames(bytes).map(decodeEntryName)

  def zipEntries(bytes: Array[Byte]): Seq[Entry] = {
    val entryNames = resolveNames(bytes)
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes),
      StandardCharsets.ISO_8859_1)
    val out = Seq.newBuilder[Entry]
    var i = 0
    var e: ZipEntry = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val bos = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = zin.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = zin.read(buf) }
        val c = bos.toByteArray
        // fall back to the reader's name if the central dir was short
        val nm = if (i < entryNames.length) entryNames(i) else e.getName
        out += Entry(nm, c, c.length.toLong)
      }
      i += 1
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** Deterministic in-memory zip with the given (name, content) pairs
    * — used to synthesize archive fixtures from table rows.
    */
  def zipCreate(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos, StandardCharsets.UTF_8)
    entries.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(0L) // deterministic archive bytes
      zout.putNextEntry(e)
      zout.write(content)
      zout.closeEntry()
    }
    zout.close()
    bos.toByteArray
  }

  /** [[ZipEntriesExpr]]'s result type:
    * array<struct<name:string,content:binary,size:long>>.
    */
  val EntrySchema: ArrayType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("size", LongType, nullable = false))),
    containsNull = false)

  /** [[zipEntries]] delivered in Catalyst internal format — the static
    * kernel the expression's codegen calls.
    */
  def zipEntriesCatalyst(b: Array[Byte]): ArrayData =
    new GenericArrayData(zipEntries(b).map(e =>
      InternalRow(UTF8String.fromString(e.name), e.content, e.size)))

  /** (name, content) → single-entry zip (plus a fixed manifest entry
    * so archives always have >1 entry like real test-log packs) — the
    * static kernel behind [[ZipCreate2]].
    */
  def zipCreate2Kernel(name: UTF8String, content: UTF8String): Array[Byte] = {
    val n = name.toString
    zipCreate(Seq(
      n -> content.toString.getBytes(StandardCharsets.UTF_8),
      "meta/manifest.txt" -> s"entry=$n".getBytes(StandardCharsets.UTF_8)))
  }

  /** binary zip → array<struct<name,content,size>> column. */
  def zipEntriesCol(c: Column): Column = columnOf(ZipEntriesExpr(expressionOf(c)))

  /** (name, content) → archive-bytes column. */
  def zipCreate2Col(name: Column, content: Column): Column =
    columnOf(ZipCreate2(expressionOf(name), expressionOf(content)))
}
