package graft

import graft.operators.FileMetaOps
import org.apache.spark.sql.functions._

class FileMetaSpec extends GraftSpec {

  test("C1 extracts folder/name/ext/depth for a known row") {
    // doc_id 0: deep route (0%3==0), .log ext (0%4==0)
    val r = FileMetaOps.fileMetaExtract(spark, Sf)
      .filter(col("doc_id") === 0).head()
    val path = r.getAs[String]("path")
    assert(path.endsWith("/deep/d0.log"))
    assert(r.getAs[String]("name") == "d0.log")
    assert(r.getAs[String]("ext") == ".log")
    assert(r.getAs[String]("folder") == path.stripSuffix("/d0.log"))
    assert(r.getAs[Long]("depth") == 3)
  }

  test("C2 excludes deep paths, zips and dats") {
    val kept = FileMetaOps.filePatternFilter(spark, Sf).collect()
    kept.foreach { r =>
      val p = r.getAs[String]("path")
      assert(p.endsWith(".log") || p.endsWith(".txt"))
      assert(!p.contains("/deep/"))
    }
  }

  test("C3 parses the BSI embedded timestamp components") {
    val r = FileMetaOps.bsiTestIdTime(spark, Sf)
      .filter(col("doc_id") === 123).head()
    // doc 123: day=123%28+1=12, hour=123%24=3, min=861%60=21, sec=1599%60=39, ms=3813%1000=813
    val t = r.getAs[java.sql.Timestamp]("folder_time").toString
    assert(t == "2017-06-12 03:21:39.813", t)
    assert(r.getAs[String]("file_date") == "2017-06-12")
    assert(r.getAs[java.sql.Timestamp]("create_time") ==
      r.getAs[java.sql.Timestamp]("folder_time"))
  }

  test("C4 compress policy follows size and extension rules") {
    FileMetaOps.contentPolicy(spark, Sf).collect().foreach { r =>
      val expect = r.getAs[Long]("size") > 1024 &&
        !Set(".zip").contains(r.getAs[String]("ext")) // only .zip in our ext set is non-compressible
      assert(r.getAs[Boolean]("compress") == expect)
    }
  }

  test("GBK decode roundtrip via GbkDecode expression") {
    import spark.implicits._
    val gbkBytes = "日志采集".getBytes("GBK")
    val df = Seq(Tuple1(gbkBytes)).toDF("b")
      .select(graft.functions.ContentFns.gbkDecode(col("b")).as("s"))
    assert(df.head().getString(0) == "日志采集")
  }

  test("zip entry names: UTF-8 kept, GBK fallback (kafka.go:234-241)") {
    import java.io.ByteArrayOutputStream
    import java.nio.charset.{Charset, StandardCharsets}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    // a Windows-style archive: GBK-encoded entry name, no UTF-8 flag
    def archive(cs: Charset, name: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val zout = new ZipOutputStream(bos, cs)
      zout.putNextEntry(new ZipEntry(name))
      zout.write("content".getBytes(StandardCharsets.UTF_8))
      zout.closeEntry(); zout.close()
      bos.toByteArray
    }
    val gbkNames = graft.functions.ZipFns
      .zipEntries(archive(Charset.forName("GBK"), "测试日志/结果.txt"))
      .map(_.name)
    assert(gbkNames == Seq("测试日志/结果.txt"))
    // UTF-8-flagged and plain-ASCII names pass through untouched
    val utfNames = graft.functions.ZipFns
      .zipEntries(archive(StandardCharsets.UTF_8, "日志.txt")).map(_.name)
    assert(utfNames == Seq("日志.txt"))
    val asciiNames = graft.functions.ZipFns
      .zipEntries(archive(Charset.forName("GBK"), "plain/log.txt")).map(_.name)
    assert(asciiNames == Seq("plain/log.txt"))
    // flagged Latin-1-supplement name: all chars <= 0xFF but the raw
    // bytes are valid UTF-8 — must NOT fall into the GBK path
    val latinNames = graft.functions.ZipFns
      .zipEntries(archive(StandardCharsets.UTF_8, "müller.txt")).map(_.name)
    assert(latinNames == Seq("müller.txt"))
  }

  test("zip64 sentinels fail loudly instead of mis-decoding names") {
    import java.io.ByteArrayOutputStream
    import java.nio.charset.StandardCharsets
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val bos = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos, StandardCharsets.UTF_8)
    zout.putNextEntry(new ZipEntry("a.txt"))
    zout.write("x".getBytes(StandardCharsets.UTF_8))
    zout.closeEntry(); zout.close()
    val bytes = bos.toByteArray
    // saturate the EOCD's 16-bit entry count with NO zip64 structures:
    // 0xFFFF is a sentinel only when zip64 records exist — a classic
    // archive with exactly 65535 entries writes it literally, so the
    // reader must fall back to walking the central directory by
    // signature rather than rejecting the archive
    var e = bytes.length - 22
    while (!(bytes(e) == 0x50 && bytes(e + 1) == 0x4B &&
      bytes(e + 2) == 0x05 && bytes(e + 3) == 0x06)) e -= 1
    bytes(e + 10) = 0xFF.toByte; bytes(e + 11) = 0xFF.toByte
    assert(graft.functions.ZipFns.zipEntries(bytes).map(_.name) ==
      Seq("a.txt"))
    // the CD OFFSET sentinel without zip64 is genuinely unresolvable
    val bytes2 = bos.toByteArray
    var eo = bytes2.length - 22
    while (!(bytes2(eo) == 0x50 && bytes2(eo + 1) == 0x4B &&
      bytes2(eo + 2) == 0x05 && bytes2(eo + 3) == 0x06)) eo -= 1
    for (k <- 16 to 19) bytes2(eo + k) = 0xFF.toByte
    val ex = intercept[UnsupportedOperationException] {
      graft.functions.ZipFns.zipEntries(bytes2)
    }
    assert(ex.getMessage.contains("zip64"))

    // the other detection path: a VALIDATED zip64 EOCD locator — sig
    // 20 bytes before the EOCD whose offset field points at a real
    // zip64-EOCD record signature (here spliced in just before it)
    val clean = bos.toByteArray
    var e2 = clean.length - 22
    while (!(clean(e2) == 0x50 && clean(e2 + 1) == 0x4B &&
      clean(e2 + 2) == 0x05 && clean(e2 + 3) == 0x06)) e2 -= 1
    def le32(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val z64sig = Array[Byte](0x50, 0x4B, 0x06, 0x06) // record the locator points at
    val locator = Array[Byte](0x50, 0x4B, 0x06, 0x07) ++ // locator sig
      le32(0) ++ le32(e2) ++ le32(0) ++ le32(1) // disk#, offset u64(lo,hi), disks
    val spliced = clean.take(e2) ++ z64sig ++ locator ++ clean.drop(e2)
    val ex2 = intercept[UnsupportedOperationException] {
      graft.functions.ZipFns.zipEntries(spliced)
    }
    assert(ex2.getMessage.contains("zip64"))

    // a coincidental locator-sig byte pattern with no real zip64 EOCD
    // behind it must NOT reject the archive
    val fake = Array[Byte](0x50, 0x4B, 0x06, 0x07) ++ new Array[Byte](16)
    val benign = clean.take(e2) ++ fake ++ clean.drop(e2)
    assert(graft.functions.ZipFns.zipEntries(benign).map(_.name) == Seq("a.txt"))
  }

  /** Rewrite a classic archive into zip64 form: EOCD count/offset
    * saturated, a real zip64 EOCD record + locator appended, and the
    * FIRST central record's local-header offset moved into a 0x0001
    * extra field — the exact shape a >4 GiB writer produces, scaled
    * down so it fits in memory.
    */
  private def toZip64(bytes: Array[Byte]): Array[Byte] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
    def le16(v: Int): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le64(v: Long): Array[Byte] = le32(v & 0xFFFFFFFFL) ++ le32(v >>> 32)
    var e = bytes.length - 22
    while (!(bytes(e) == 0x50 && bytes(e + 1) == 0x4B &&
      bytes(e + 2) == 0x05 && bytes(e + 3) == 0x06)) e -= 1
    val count = u16(e + 10)
    val cdOff = u32(e + 16).toInt
    val cdSize = u32(e + 12).toInt
    // rebuild the CD, first record's offset -> zip64 extra field
    val out = Array.newBuilder[Byte]
    var p = cdOff
    var first = true
    while (p < cdOff + cdSize) {
      assert(u32(p) == 0x02014B50L)
      val nameLen = u16(p + 28); val extraLen = u16(p + 30)
      val cmtLen = u16(p + 32)
      if (first) {
        val rec = java.util.Arrays.copyOfRange(bytes, p, p + 46 + nameLen + extraLen + cmtLen)
        val off = u32(p + 42)
        // saturate the offset field, grow the extra area by 12 bytes
        System.arraycopy(le16(extraLen + 12), 0, rec, 30, 2)
        System.arraycopy(le32(0xFFFFFFFFL), 0, rec, 42, 4)
        out ++= rec.take(46 + nameLen + extraLen)
        out ++= le16(0x0001) ++ le16(8) ++ le64(off)
        out ++= rec.drop(46 + nameLen + extraLen)
        first = false
      } else out ++= java.util.Arrays.copyOfRange(bytes, p,
        p + 46 + nameLen + extraLen + cmtLen)
      p += 46 + nameLen + extraLen + cmtLen
    }
    val newCd = out.result()
    val z64At = cdOff + newCd.length
    val z64 = Array[Byte](0x50, 0x4B, 0x06, 0x06) ++ le64(44) ++
      le16(45) ++ le16(45) ++ le32(0) ++ le32(0) ++
      le64(count) ++ le64(count) ++ le64(newCd.length) ++ le64(cdOff)
    val locator = Array[Byte](0x50, 0x4B, 0x06, 0x07) ++ le32(0) ++
      le64(z64At + 0L) ++ le32(1)
    val eocd = java.util.Arrays.copyOfRange(bytes, e, bytes.length)
    System.arraycopy(le16(0xFFFF), 0, eocd, 8, 2)  // entries on disk
    System.arraycopy(le16(0xFFFF), 0, eocd, 10, 2) // total entries
    System.arraycopy(le32(0xFFFFFFFFL), 0, eocd, 16, 4) // cd offset
    bytes.take(cdOff) ++ newCd ++ z64 ++ locator ++ eocd
  }

  test("zip64 positive path: a real zip64 archive expands with correct names") {
    import java.io.ByteArrayOutputStream
    import java.nio.charset.{Charset, StandardCharsets}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    // multi-entry archive with a GBK-named entry (no UTF-8 flag): the
    // zip64 walk must still apply the reference's byte-level name rule
    val bos = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos, Charset.forName("GBK"))
    for ((n, c) <- Seq("测试/结果.txt" -> "alpha", "plain/b.log" -> "beta",
        "c.dat" -> "gamma")) {
      zout.putNextEntry(new ZipEntry(n))
      zout.write(c.getBytes(StandardCharsets.UTF_8))
      zout.closeEntry()
    }
    zout.close()
    val classic = bos.toByteArray
    val expected = graft.functions.ZipFns.zipEntries(classic)
      .map(en => (en.name, en.size, new String(en.content, "UTF-8")))
    val z64 = toZip64(classic)
    val got = graft.functions.ZipFns.zipEntries(z64)
      .map(en => (en.name, en.size, new String(en.content, "UTF-8")))
    assert(got == expected, s"zip64 roundtrip diverged: $got")
    assert(got.map(_._1) == Seq("测试/结果.txt", "plain/b.log", "c.dat"))
  }

  test("C9 jsonl health report counts malformed lines without failing") {
    val d = java.nio.file.Files.createTempDirectory("jsonl_health")
    java.nio.file.Files.write(d.resolve("part.jsonl"),
      ("""{"doc_id":1,"text":"ok","lang":"en","source":"s","n_chars":2}""" +
        "\n{broken json line\n" +
        """{"doc_id":2,"text":"also ok","lang":"de","source":"s","n_chars":7}""" +
        "\n").getBytes("UTF-8"))
    val r = graft.sources.IngestSources
      .jsonlHealth(spark, d.toFile.getAbsolutePath).collect()(0)
    assert(r.getAs[Long]("n_lines") == 3 &&
      r.getAs[Long]("n_corrupt") == 1 && r.getAs[Long]("n_clean") == 2)
  }

  test("C9/C10 text-format roundtrips preserve every row") {
    val orig = Tables.documents(spark, Sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sorted
    Seq(graft.sources.IngestSources.jsonlIngest(spark, Sf),
        graft.sources.IngestSources.csvIngest(spark, Sf)).foreach { df =>
      val got = df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3), r.getLong(4))).toSeq.sorted
      assert(got == orig)
    }
  }
}
