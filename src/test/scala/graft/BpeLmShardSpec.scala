package graft

import graft.functions.{IntMath, WinnowFingerprints}
import graft.operators.{BpeOps, CurationOps, TextOps}
import org.apache.spark.sql.functions._

/** D37/D38/D39: export-shard manifest, bigram-LM scoring, BPE
  * tokenizer induction. The heavy checks recompute each operator's
  * answer with an INDEPENDENT implementation (list-based merge loop,
  * hashmap LM, driver-side checksum fold) so oracle and operator can't
  * share a bug.
  */
class BpeLmShardSpec extends GraftSpec {

  // ---- IntKernels ------------------------------------------------

  test("qlog2: exact at powers of two, monotone, bounded error, 2^53 domain edge") {
    for (k <- 0 to 52)
      assert(IntMath.qlog2(1L << k) == k.toLong * 1024, s"2^$k")
    var prev = Long.MinValue
    for (n <- (1L to 5000L) ++ Seq(Long.MaxValue >> 12, (1L << 53) - 1)) {
      val q = IntMath.qlog2(n)
      assert(q >= prev, s"monotonicity broke at $n")
      prev = q
      val err = math.abs(q / 1024.0 - math.log(n.toDouble) / math.log(2.0))
      assert(err < 0.09, s"qlog2($n) off by $err bits")
    }
    intercept[IllegalArgumentException](IntMath.qlog2(0L))
  }

  test("mix64 kernel equals the winnow splitmix finalizer (shared constants)") {
    for (x <- Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 7919L))
      assert(IntMath.mix64(x) == WinnowFingerprints.mix(x))
  }

  // ---- BPE -------------------------------------------------------

  /** Independent merge application: explicit list scan with a
    * leftmost-greedy tail merge — no strings, no replace.
    */
  private def applyMergeList(sy: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    sy.foreach { s =>
      if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = l + r
      else out += s
    }
    out.toList
  }

  test("bpe merge semantics: doubled-separator replace == leftmost-greedy list merge") {
    val cases = Seq(
      (List("a", "a", "a"), ("a", "a"), List("aa", "a")),
      (List("a", "b", "a", "b"), ("a", "b"), List("ab", "ab")),
      (List("a", "a", "a", "a"), ("a", "a"), List("aa", "aa")),
      (List("x"), ("a", "b"), List("x")),
      (List("a", "b", "b"), ("a", "b"), List("ab", "b")))
    cases.foreach { case (sy, (l, r), want) =>
      assert(applyMergeList(sy, l, r) == want)
      val st = "||" + sy.mkString("||") + "||"
      val viaReplace = BpeOps.symbols(
        st.replace(s"|$l||$r|", s"|$l$r|")).toList
      assert(viaReplace == want, s"replace path diverged on $sy + ($l,$r)")
    }
  }

  test("bpe_train matches an independent list-based trainer at sf0.001") {
    // independent loop: list states, hashmap pair counts
    val hist = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, c) => (-c, w) }.take(BpeOps.VocabCap)
    var state = hist.map { case (w, c) => (w.map(_.toString).toList, c) }
    val expected = Seq.newBuilder[(Long, String, String, String, Long)]
    var k = 1
    var stop = false
    while (k <= BpeOps.Merges && !stop) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (sy, c) =>
        sy.zip(sy.tail).foreach(p => pc.update(p, pc.getOrElse(p, 0L) + c))
      }
      if (pc.isEmpty) stop = true
      else {
        val ((l, r), n) = pc.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.head
        expected += ((k.toLong, l, r, l + r, n))
        state = state.map { case (sy, c) => (applyMergeList(sy, l, r), c) }
        k += 1
      }
    }
    val got = BpeOps.bpeTrain(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == expected.result())
  }

  test("tokenize: Spark replace-fold == driver segment(), including OOV words") {
    import spark.implicits._
    val merges = BpeOps.trainedMerges(spark, Sf)
    assert(merges.nonEmpty)
    // real vocab words + words NOT in any document (OOV path)
    val vocab = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct().as[String].collect().toSeq
    val oov = Seq("zzqx", "afilterb", merges.head.merged * 3, "a")
    val words = (vocab ++ oov).distinct
    val got = words.toDF("tok")
      .withColumn("n_pieces", BpeOps.pieceCount(merges))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      val seg = BpeOps.segment(w, merges)
      assert(seg.mkString == w, s"segmentation must tile the word: $w -> $seg")
      assert(got(w) == seg.length.toLong, s"piece count diverged for $w")
    }
  }

  // ---- LM scoring ------------------------------------------------

  test("doc_lm_score matches an independent hashmap LM at sf0.001; backoff costs more") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
      .filter(_._2.length >= 2)
    val ref = docs.filter(_._1 % 10 != 7)
    val cu = scala.collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    ref.foreach { case (_, ts) =>
      ts.foreach { t => cu.update(t, cu.getOrElse(t, 0L) + 1); n += 1 }
    }
    val cb = scala.collection.mutable.HashMap.empty[(String, String), Long]
    ref.foreach { case (_, ts) =>
      ts.zip(ts.tail).foreach(p => cb.update(p, cb.getOrElse(p, 0L) + 1))
    }
    val expected = docs.map { case (id, ts) =>
      val bits = ts.zip(ts.tail).map { case (a, b) =>
        cb.get((a, b)) match {
          case Some(cab) => IntMath.qlog2(cu(a)) - IntMath.qlog2(cab)
          case None =>
            IntMath.qlog2(n) - IntMath.qlog2(cu.getOrElse(b, 1L)) + 4096L
        }
      }
      id -> ((ts.length - 1).toLong, bits.sum)
    }.toMap
    val got = TextOps.lmScore(spark, Sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nt, xq) = expected(r.getLong(0))
      assert(r.getLong(1) == nt && r.getLong(2) == xq,
        s"doc ${r.getLong(0)}: got (${r.getLong(1)}, ${r.getLong(2)}) want ($nt, $xq)")
      val bpt = r.getDouble(3)
      assert(bpt == xq.toDouble / (1024.0 * nt))
      assert(xq >= 0, "seen-bigram bits are q(c_a) - q(c_ab) >= 0")
    }
    // a transition unseen in the reference must cost more than any
    // seen transition of the same target (penalty + full-N backoff)
    val seenMax = docs.flatMap { case (_, ts) =>
      ts.zip(ts.tail).collect { case (a, b) if cb.contains((a, b)) =>
        IntMath.qlog2(cu(a)) - IntMath.qlog2(cb((a, b))) }
    }.max
    val unseenBits = IntMath.qlog2(n) - IntMath.qlog2(1L) + 4096L
    assert(unseenBits > seenMax)
  }

  test("doc_pack_bpe: window math over real piece counts") {
    val pieces = operators.BpeOps.tokenizeBpe(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_pieces")).toMap
    val rows = operators.BpeOps.packBpe(spark, Sf).collect()
    assert(rows.length == pieces.size)
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket")))
      .values.foreach { grp =>
        var cum = 0L
        grp.sortBy(_.getLong(0)).foreach { r =>
          cum += pieces(r.getLong(0))
          assert(r.getAs[Long]("n_pieces") == pieces(r.getLong(0)))
          assert(r.getAs[Long]("cum_pieces") == cum, s"cum at doc ${r.getLong(0)}")
          assert(r.getAs[Long]("bin_id") == (cum - 1) / 1024)
        }
      }
  }

  // ---- persisted LM / tokenizer layouts --------------------------

  test("layout LM probe + persisted tokenizer serve a 'restarted' session identically") {
    import graft.operators.LayoutOps
    val fams = Seq("lm_unigrams", "lm_bigrams", "bpe_merges")
    def purge(): Unit = fams.foreach(f =>
      graft.sources.LayoutStore.purge(spark,
        LayoutOps.tableName(LayoutOps.families.find(_.name == f).get, Sf)))
    purge()
    try {
      // session-truth answers FIRST (build their own memoized state)
      val wantLm = operators.TextOps.lmScore(spark, Sf).collect()
        .filter(_.getLong(0) % 10 == 7).map(_.toSeq).toSeq
      val wantTok = operators.BpeOps.tokenizeBpe(spark, Sf).collect()
        .map(_.toSeq).toSeq
      // deploy the layouts, then simulate the restart: catalog death
      // + all session memo state gone
      fams.foreach(f => LayoutOps.ensure(spark, Sf, f))
      fams.foreach(f => graft.sources.LayoutStore.dropCatalogEntry(spark,
        LayoutOps.tableName(LayoutOps.families.find(_.name == f).get, Sf)))
      Memo.clear(spark)
      // the restarted session must re-register (NOT rebuild) ...
      assert(LayoutOps.ensure(spark, Sf, "lm_bigrams") == "reregistered")
      // ... and serve the same answers from the tables alone
      val gotLm = LayoutOps.lmDeltaScored(spark, Sf).collect().map(_.toSeq).toSeq
      assert(gotLm == wantLm, "persisted-LM delta scores diverged")
      val gotTok = LayoutOps.bpeTokenizeServed(spark, Sf).collect()
        .map(_.toSeq).toSeq
      assert(gotTok == wantTok, "persisted-tokenizer piece counts diverged")
    } finally purge()
  }

  // ---- export shards ---------------------------------------------

  test("corpus_export_shards: partition of corpus_build, driver-fold checksum parity") {
    val manifest = CurationOps.corpusBuild(spark, Sf).collect()
    val shards = CurationOps.exportShards(spark, Sf).collect()
    assert(shards.map(_.getLong(0)).toSeq == shards.map(_.getLong(0)).toSeq.sorted)
    assert(shards.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 8))
    assert(shards.map(_.getLong(1)).sum == manifest.length.toLong,
      "shards must partition the manifest")
    // independent driver fold with the kernel functions
    val byShard = manifest.groupBy { r =>
      java.lang.Math.floorMod(IntMath.mix64(r.getAs[Long]("doc_id")), 8L)
    }
    shards.foreach { r =>
      val rows = byShard(r.getLong(0))
      assert(r.getAs[Long]("n_docs") == rows.length.toLong)
      assert(r.getAs[Long]("n_tokens") == rows.map(_.getAs[Long]("n_tokens")).sum)
      assert(r.getAs[Long]("n_bins") ==
        rows.map(_.getAs[Long]("bin_id")).distinct.length.toLong)
      assert(r.getAs[Long]("min_doc") == rows.map(_.getAs[Long]("doc_id")).min)
      assert(r.getAs[Long]("max_doc") == rows.map(_.getAs[Long]("doc_id")).max)
      // order-independent sum mod 2^64 == wrapping Long sum
      val ck = rows.map { m =>
        IntMath.mix64(m.getAs[Long]("doc_id")) ^
          IntMath.mix64(m.getAs[Long]("n_tokens") + 7919L)
      }.foldLeft(0L)(_ + _) // wrapping add == mod 2^64 on the signed word
      assert(r.getAs[Long]("ck") == ck, s"shard ${r.getLong(0)} checksum")
    }
  }
}
