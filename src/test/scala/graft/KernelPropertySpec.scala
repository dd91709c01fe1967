package graft

import graft.functions.{WinnowFingerprints, WinnowKernel}
import graft.plans.TopKHeaps
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic randomized properties of the custom kernels (fixed
  * seeds — no flakiness), checked against brute-force references.
  */
class KernelPropertySpec extends AnyFunSuite {
  private val rnd = new java.util.Random(42)

  test("ZMath interleave: bit-reference equality, roundtrip, prefix law") {
    import graft.functions.ZMath
    def reference(x: Long, y: Long): Long =
      (0 until 31).foldLeft(0L)((z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    for (_ <- 1 to 200) {
      val x = rnd.nextLong() & 0x7FFFFFFFL
      val y = rnd.nextLong() & 0x7FFFFFFFL
      val z = ZMath.interleave(x, y)
      assert(z == reference(x, y))
      assert(z >= 0L)
      assert(ZMath.deinterleave(z) == ((x, y)))
      // the property the zp partition key rests on: interleaving the
      // coordinate PREFIXES equals the z-value's prefix
      val s = 1 + rnd.nextInt(20)
      assert(ZMath.interleave(x >> s, y >> s) == (z >> (2 * s)))
    }
    intercept[IllegalArgumentException](ZMath.interleave(1L << 31, 0L))
    intercept[IllegalArgumentException](ZMath.interleave(0L, -1L))
  }

  test("TopKHeaps.Heap equals sort-take-k on random data") {
    val ord = Ordering.by[InternalRow, Long](_.getLong(0))
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(20)
      val values = Array.fill(n)(rnd.nextLong())
      val heap = new TopKHeaps.Heap(ord, k)
      values.foreach { v =>
        val r = new GenericInternalRow(1); r.setLong(0, v); heap.offer(r)
      }
      val got = heap.sorted.map(_.getLong(0)).toSeq
      val want = values.sorted.take(k).toSeq
      assert(got == want)
    }
  }

  test("avro envelope roundtrips random payloads bit-faithfully") {
    import graft.functions.AvroEnvelope
    def rndStr(): String = {
      val n = rnd.nextInt(40)
      // exercise multi-byte UTF-8 too (the kernel writes raw UTF-8
      // bytes straight from the row; decode must agree)
      val pool = "abc /.é日志"
      (0 until n).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
    for (_ <- 1 to 50) {
      val strs = Array.fill(8)(rndStr())
      val longs = Array.fill(5)(rnd.nextLong())
      val compress = rnd.nextBoolean()
      val schemaId = rnd.nextInt(Int.MaxValue)
      val row = new GenericInternalRow(13)
      // order: file_date, file_time, folder, pack, name, size,
      // modify_time, content, compress, compress_size, checksum, host,
      // folder_time
      row.update(0, UTF8String.fromString(strs(0))); row.setLong(1, longs(0))
      row.update(2, UTF8String.fromString(strs(1)))
      row.update(3, UTF8String.fromString(strs(2)))
      row.update(4, UTF8String.fromString(strs(3))); row.setLong(5, longs(1))
      row.setLong(6, longs(2)); row.update(7, UTF8String.fromString(strs(4)))
      row.setBoolean(8, compress); row.setLong(9, longs(3))
      row.update(10, UTF8String.fromString(strs(5)))
      row.update(11, UTF8String.fromString(strs(6)))
      row.setLong(12, longs(4))
      val bytes = AvroEnvelope.encode(row, schemaId)
      assert(bytes(0) == 0.toByte)
      val (id, rec) = AvroEnvelope.decode(bytes)
      assert(id == schemaId)
      assert(rec.get("file_date").toString == strs(0))
      assert(rec.get("folder").toString == strs(1))
      assert(rec.get("pack").toString == strs(2))
      assert(rec.get("name").toString == strs(3))
      assert(rec.get("content").toString == strs(4))
      assert(rec.get("checksum").toString == strs(5))
      assert(rec.get("host").toString == strs(6))
      assert(rec.get("file_time") == longs(0) && rec.get("size") == longs(1))
      assert(rec.get("modify_time") == longs(2))
      assert(rec.get("compress_size") == longs(3))
      assert(rec.get("folder_time") == longs(4))
      assert(rec.get("compress") == compress)
    }
  }

  test("winnow kernel equals brute-force rolling minima") {
    val k = 8; val w = 4
    for (_ <- 1 to 30) {
      val len = k + rnd.nextInt(120)
      val s = (0 until len).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      val got = WinnowKernel.compute(UTF8String.fromString(s), k, w)
        .toLongArray().toSet
      // brute force: hash every k-gram, take min of every w-window
      val bytes = s.getBytes("UTF-8")
      val grams = (0 to bytes.length - k).map { i =>
        var h = 0L
        for (j <- i until i + k) h = h * WinnowFingerprints.Base + (bytes(j) & 0xff)
        WinnowFingerprints.mix(h)
      }
      val want = (0 to grams.length - w).map(j => grams.slice(j, j + w).min).toSet
      assert(got == want, s"input=$s")
    }
  }

  test("minhash estimate approximates true jaccard (k=64)") {
    for (trial <- 1 to 20) {
      val base = (0 until 100).map(i => s"shingle_${trial}_$i")
      val overlap = rnd.nextInt(101)
      val a = base
      val b = base.take(overlap) ++ (0 until (100 - overlap))
        .map(i => s"other_${trial}_$i")
      val trueJacc = overlap.toDouble / (200 - overlap)
      def arr(xs: Seq[String]) =
        new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
      val sa = graft.functions.MinHashKernel.compute(arr(a), 64).toLongArray()
      val sb = graft.functions.MinHashKernel.compute(arr(b), 64).toLongArray()
      val est = sa.zip(sb).count { case (x, y) => x == y } / 64.0
      assert(math.abs(est - trueJacc) < 0.25,
        s"overlap=$overlap est=$est true=$trueJacc")
    }
  }

  test("heap ties keep deterministic order under multi-column ordering") {
    // rows (v, id): order by v desc, id asc — ties on v broken by id
    val ord = new Ordering[InternalRow] {
      def compare(a: InternalRow, b: InternalRow): Int = {
        val c = java.lang.Long.compare(b.getLong(0), a.getLong(0))
        if (c != 0) c else java.lang.Long.compare(a.getLong(1), b.getLong(1))
      }
    }
    val heap = new TopKHeaps.Heap(ord, 3)
    for (id <- 0 until 50) {
      val r = new GenericInternalRow(2)
      r.setLong(0, id % 5); r.setLong(1, id)
      heap.offer(r)
    }
    val got = heap.sorted.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((4L, 4L), (4L, 9L), (4L, 14L)))
  }

  test("rank collector drops stale boundary ties when the worst improves") {
    // order by v asc: many early ties at a bad value, then better rows
    val ord = new Ordering[InternalRow] {
      def compare(a: InternalRow, b: InternalRow): Int =
        java.lang.Long.compare(a.getLong(0), b.getLong(0))
    }
    def row(v: Long, id: Long): InternalRow = {
      val r = new GenericInternalRow(2); r.setLong(0, v); r.setLong(1, id); r
    }
    val c = new TopKHeaps.RankCollector(ord, 2)
    // 100k rows tying the initial boundary (v=40) — the stale-ties
    // clear keeps memory at O(k + current ties), not O(n)
    for (id <- 0L until 100000L) c.offer(row(40, id))
    c.offer(row(1, 200001))
    c.offer(row(2, 200002))
    // all v=40 ties are stale now; survivors are exactly the two best
    val got = c.sorted.map(r => (r.getLong(0))).toSeq
    assert(got == Seq(1L, 2L), s"got $got")

    // and genuine boundary ties at the final worst are all kept
    val c2 = new TopKHeaps.RankCollector(ord, 2)
    c2.offer(row(1, 1))
    for (id <- 0L until 5L) c2.offer(row(7, 10 + id))
    c2.offer(row(3, 2)) // improves worst 7 -> ... heap {1,3}; 7s stale
    for (id <- 0L until 3L) c2.offer(row(3, 20 + id)) // ties at new worst
    val got2 = c2.sorted.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2.map(_._1) == Seq(1L, 3L, 3L, 3L, 3L), s"got $got2")
  }

  test("BPE doubled-separator replace == leftmost-greedy list merge on random states") {
    // the equivalence BpeOps rests on (driver String.replace, Spark
    // SQL replace, DuckDB replace all share leftmost-nonoverlapping
    // semantics) — randomized over multi-char symbols incl. symbols
    // that are concatenations of others (the post-merge alphabet)
    val alphabet = Vector("a", "b", "c", "ab", "bc", "aa", "abc")
    for (_ <- 1 to 500) {
      val n = 1 + rnd.nextInt(12)
      val sy = List.fill(n)(alphabet(rnd.nextInt(alphabet.size)))
      val l = alphabet(rnd.nextInt(alphabet.size))
      val r = alphabet(rnd.nextInt(alphabet.size))
      // reference: explicit left-to-right scan with greedy tail merge
      val out = scala.collection.mutable.ListBuffer.empty[String]
      sy.foreach { s =>
        if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = l + r
        else out += s
      }
      val st = "||" + sy.mkString("||") + "||"
      val viaReplace = st.replace(s"|$l||$r|", s"|$l$r|")
        .split("\\|\\|").filter(_.nonEmpty).toList
      assert(viaReplace == out.toList,
        s"diverged on $sy + ($l,$r): replace=$viaReplace scan=${out.toList}")
    }
  }

  test("dHash56: 56-bit range, brute-force parity, one-pixel locality <= 2 bits") {
    import graft.multimodal.MultimodalOps
    def img(px: Array[Array[Int]]): java.awt.image.BufferedImage = {
      val b = new java.awt.image.BufferedImage(
        px(0).length, px.length, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- px.indices; x <- px(0).indices) b.setRGB(x, y, px(y)(x))
      b
    }
    def gray(p: Int): Int = (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
    for (_ <- 1 to 50) {
      val px = Array.fill(8, 8)(rnd.nextInt(1 << 24))
      val h = MultimodalOps.dHash56(img(px))
      assert(h >= 0L && h < (1L << 56))
      // brute-force bit layout reference
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 7)
        if (gray(px(y)(x + 1)) > gray(px(y)(x))) want |= 1L << (y * 7 + x)
      assert(h == want)
      // locality: changing ONE pixel flips at most its two adjacent
      // comparisons — the property that makes dHash a near-dup hash
      val (py, pxx) = (rnd.nextInt(8), rnd.nextInt(8))
      val px2 = px.map(_.clone())
      px2(py)(pxx) = rnd.nextInt(1 << 24)
      val h2 = MultimodalOps.dHash56(img(px2))
      assert(java.lang.Long.bitCount(h ^ h2) <= 2,
        s"one-pixel edit flipped >2 bits at ($pxx,$py)")
    }
  }
}
