package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Zip-archive expansion (handler/kafka.go:210-270): one record per
  * non-directory entry; entry names that aren't valid UTF-8 are
  * decoded as GBK (handler/kafka.go:234-241 via handler.go:48-56
  * GBKToUTF8) — Windows tools write simplified-Chinese entry names in
  * GBK without the zip UTF-8 flag.
  *
  * Deliberately Scala UDFs, not Catalyst expressions: these run once
  * per ARCHIVE (coarse-grained, the zip inflate dominates the row
  * overhead) and feed a Generate/explode, which ends the codegen
  * pipeline anyway — unlike the per-token kernels (MinHash/SimHash/
  * Winnow) where expression codegen buys 5-50×.
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
    */
  private def rawNames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
    var e = bytes.length - 22 // min EOCD size; scan back over any comment
    while (e >= 0 && !(bytes(e) == 0x50 && bytes(e + 1) == 0x4B &&
      bytes(e + 2) == 0x05 && bytes(e + 3) == 0x06)) e -= 1
    if (e < 0) return IndexedSeq.empty // not a zip; reader will error out
    val count = u16(e + 10)
    val cdOff = u32(e + 16)
    // zip64 detection: a locator record (sig 0x07064b50) sits 20 bytes
    // before the EOCD, and/or the 16-bit count / 32-bit offset carry
    // their saturation sentinels. The walk below would then find too
    // few records and the remaining entry names would silently fall
    // back to ISO-8859-1 mojibake — fail loudly instead. A sig match
    // alone could be a coincidence in the preceding record's bytes, so
    // the locator is validated by following its zip64-EOCD offset
    // (u64; high half must be 0 for an in-memory archive) to the
    // 0x06064b50 record signature.
    val zip64Locator = e >= 20 && u32(e - 20) == 0x07064B50L && {
      val z64Off = u32(e - 12) // low 32 bits of the u64 offset
      u32(e - 8) == 0L && z64Off + 4 <= bytes.length &&
        u32(z64Off.toInt) == 0x06064B50L
    }
    if (zip64Locator || count == 0xFFFF || cdOff == 0xFFFFFFFFL)
      throw new UnsupportedOperationException(
        "zip64 archive: central-directory name decoding not supported")
    var p = cdOff.toInt // central directory offset
    val recs = IndexedSeq.newBuilder[(Long, Array[Byte])]
    var i = 0
    while (i < count && p + 46 <= bytes.length && u32(p) == 0x02014B50L) {
      val nameLen = u16(p + 28)
      recs += ((u32(p + 42), // local header offset = local entry order
        java.util.Arrays.copyOfRange(bytes, p + 46, p + 46 + nameLen)))
      p += 46 + nameLen + u16(p + 30) + u16(p + 32)
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

  /** binary zip -> array<struct<name,content,size>> */
  val zip_entries = udf((b: Array[Byte]) => if (b == null) Seq.empty[Entry] else zipEntries(b))

  /** (name, content) -> single-entry zip (plus a fixed manifest entry
    * so archives always have >1 entry like real test-log packs).
    */
  val zip_create2 = udf((name: String, content: String) =>
    zipCreate(Seq(
      name -> content.getBytes(StandardCharsets.UTF_8),
      "meta/manifest.txt" -> s"entry=$name".getBytes(StandardCharsets.UTF_8))))

  def zipEntriesCol(c: Column): Column = zip_entries(c)
}
