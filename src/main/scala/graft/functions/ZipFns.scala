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

  /** Entry-name decode matching the reference's utf8.ValidString →
    * GBKToUTF8 fallback. The archive is opened with ISO-8859-1, which
    * is byte-preserving for entries WITHOUT the zip UTF-8 flag (java
    * .util.zip decodes flagged entries as UTF-8 regardless of the
    * constructor charset), so the raw name bytes are recoverable here:
    * valid UTF-8 → keep; otherwise → GBK. Names containing chars
    * > 0xFF came from a flagged UTF-8 decode and pass through.
    */
  private[graft] def decodeEntryName(raw: String): String = {
    if (raw.exists(_ > 0xFF)) return raw // already UTF-8-flag decoded
    val bytes = raw.getBytes(StandardCharsets.ISO_8859_1)
    val dec = StandardCharsets.UTF_8.newDecoder()
    try { dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString }
    catch { case _: java.nio.charset.CharacterCodingException =>
      new String(bytes, "GBK") }
  }

  def zipEntries(bytes: Array[Byte]): Seq[Entry] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes),
      StandardCharsets.ISO_8859_1)
    val out = Seq.newBuilder[Entry]
    var e: ZipEntry = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val bos = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = zin.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = zin.read(buf) }
        val c = bos.toByteArray
        out += Entry(decodeEntryName(e.getName), c, c.length.toLong)
      }
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
