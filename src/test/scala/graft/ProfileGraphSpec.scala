package graft

import graft.operators.{GraphOps, ProfileOps}
import org.apache.spark.sql.functions._

/** D41–D44: intake profiling, quality gates, source overlap (exact vs
  * sketched), and the integer PageRank.
  */
class ProfileGraphSpec extends GraftSpec {

  test("data_profile: one row per metric, counts agree with the table") {
    val prof = ProfileOps.dataProfile(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val n = Tables.documents(spark, Sf).count().toDouble
    assert(prof.size == 26)
    assert(prof(("table", "n_rows")) == n)
    assert(prof(("doc_id", "n_distinct")) == n) // ids are unique
    assert(prof(("doc_id", "n_null")) == 0.0)
    assert(prof(("n_chars", "min")) >= 0.0)
    assert(prof(("n_chars", "mean")) <= prof(("n_chars", "max")))
    // the generator sets n_chars = length(text): the two mean metrics agree
    assert(prof(("n_chars", "mean")) == prof(("text_len", "mean")))
  }

  test("quality_gates: the clean corpus passes every gate") {
    val gates = ProfileOps.qualityGates(spark, Sf).collect()
    assert(gates.length == 6)
    gates.foreach { g =>
      assert(g.getBoolean(3), s"gate ${g.getString(0)} failed: ${g.getDouble(1)}")
      assert(g.getDouble(1) >= g.getDouble(2))
    }
  }

  test("sourceOverlapApprox tracks the exact overlap within HLL tolerance") {
    val exact = ProfileOps.sourceOverlap(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    val approx = ProfileOps.sourceOverlapApprox(spark, Sf).collect()
    assert(approx.map(r => (r.getString(0), r.getString(1))).toSet ==
      exact.keySet)
    approx.foreach { r =>
      val e = exact((r.getString(0), r.getString(1)))
      val a = r.getLong(4).toDouble // hll_sketch_estimate yields BIGINT
      // lgK=14 on small per-source sets: near-exact; allow 5% + small abs
      assert(math.abs(a - e) <= math.max(5.0, e * 0.05),
        s"${r.getString(0)}-${r.getString(1)}: est $a vs exact $e")
    }
  }

  test("source_overlap jaccard is consistent with its own counts") {
    ProfileOps.sourceOverlap(spark, Sf).collect().foreach { r =>
      val (na, nb, nc) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nc <= math.min(na, nb))
      assert(r.getDouble(5) == nc.toDouble / (na + nb - nc))
    }
  }

  test("graph_pagerank: full node cover, positive integer mass, conserved bound") {
    val n = Tables.documents(spark, Sf).count()
    val pr = GraphOps.pageRank(spark, Sf).collect()
    assert(pr.length == n)
    val r0 = GraphOps.TotalMass / n
    val base = r0 * 3 / 20
    assert(pr.forall(_.getLong(1) >= base), "every node keeps the base mass")
    // floor divisions only ever drop mass: total never exceeds the start
    assert(pr.map(_.getLong(1)).sum <= GraphOps.TotalMass)
    // the ranking is non-degenerate: not all nodes equal
    assert(pr.map(_.getLong(1)).distinct.length > 1)
  }

  test("graph_triangles equals the brute-force adjacency-set count") {
    val n = Tables.documents(spark, Sf).count()
    // rebuild the canonical simple graph from the kernel
    val adj = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
    def link(a: Long, b: Long): Unit =
      adj.getOrElseUpdate(a, collection.mutable.Set.empty) += b
    for (src <- 0L until n; j <- 0 until GraphOps.OutDegree) {
      val dst = java.lang.Math.floorMod(
        graft.functions.WinnowFingerprints.mix(src * 1000003L + j.toLong), n)
      if (dst != src) { link(src, dst); link(dst, src) }
    }
    // enumerate each triangle once (c > b > a), credit all 3 corners
    val tri = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, na) <- adj; b <- na if b > a; c <- na.intersect(adj(b)) if c > b) {
      tri(a) += 1; tri(b) += 1; tri(c) += 1
    }
    val got = GraphOps.triangles(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == tri.toMap, s"per-node triangle counts diverge")
    assert(got.values.sum % 3 == 0) // each triangle credited exactly thrice
    assert(got.values.sum > 0, "degenerate fixture: no triangles at all")
  }

  test("graph_link_predict equals the brute-force wedge scoring") {
    val n = Tables.documents(spark, Sf).count()
    val adj = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
    def link(a: Long, b: Long): Unit =
      adj.getOrElseUpdate(a, collection.mutable.Set.empty) += b
    for (src <- 0L until n; j <- 0 until GraphOps.OutDegree) {
      val dst = java.lang.Math.floorMod(
        graft.functions.WinnowFingerprints.mix(src * 1000003L + j.toLong), n)
      if (dst != src) { link(src, dst); link(dst, src) }
    }
    // brute force: score every non-edge pair through its capped pivots
    val sc = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((z, nz) <- adj if nz.size <= GraphOps.LinkDegCap;
         x <- nz; y <- nz if x < y) {
      val (cn, ra) = sc.getOrElse((x, y), (0L, 0L))
      sc((x, y)) = (cn + 1, ra + GraphOps.RaScale / nz.size)
    }
    val nonEdge = sc.filter { case ((x, y), _) => !adj(x).contains(y) }
    val expTop = nonEdge.toSeq
      .map { case ((x, y), (cn, ra)) => (x, y, cn, ra) }
      .sortBy { case (x, y, _, ra) => (-ra, x, y) }
      .take(GraphOps.LinkTopK)
    val got = GraphOps.linkPredict(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expTop, "link-prediction rows diverge")
    assert(got.nonEmpty, "degenerate fixture: no candidate pairs")
    assert(got.forall(_._3 >= 1))
  }

  test("linkPredict degree cap: a super-connector never pivots a wedge") {
    import spark.implicits._
    // hub 0 linked to 1..100 (degree 100 > cap); a small wedge at
    // pivot 1: 1-101, 1-102 (degree 3 <= cap)
    val und = ((1L to 100L).map(b => (0L, b)) ++
      Seq((1L, 101L), (1L, 102L)))
      .toDF("a", "b")
    val capped = GraphOps.linkPredictFromEdges(und, GraphOps.LinkDegCap, 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the C(100,2) pairs whose only common neighbor is the hub are gone;
    // pivot 1 (neighbors {0, 101, 102}, degree 3) still yields its
    // candidate pairs (0,101),(0,102),(101,102) at weight ⌊scale/3⌋
    val w = GraphOps.RaScale / 3
    assert(capped.toSet == Set(
      (0L, 101L, 1L, w), (0L, 102L, 1L, w), (101L, 102L, 1L, w)))
    // with the cap lifted the hub contributes its quadratic candidate set
    val uncapped = GraphOps.linkPredictFromEdges(und, 1000, 10000).collect()
    assert(uncapped.length == 100 * 99 / 2 + 3,
      "uncapped: C(100,2) hub-pivoted pairs plus the three pivot-1 rows")
  }

  test("graph_pagerank is deterministic across invocations") {
    val a = GraphOps.pageRank(spark, Sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = GraphOps.pageRank(spark, Sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("qualityGatesOn flags a dirty frame gate by gate") {
    import spark.implicits._
    val dirty = Seq(
      // (doc_id, text, lang, source, n_chars)
      (Some(1L), "good text", "en", "s", 9L),
      (Some(1L), "dup id", "en", "s", 6L),          // uniqueness violation
      (None, "no id", "xx", "s", 5L),               // null id + unknown lang
      (Some(2L), "", "en", "s", 0L),                // empty text + n_chars=0
      (Some(3L), "short", "en", "s", 99L))          // n_chars inconsistent
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val gates = operators.ProfileOps.qualityGatesOn(dirty).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(!gates("doc_id_complete")._2 && gates("doc_id_complete")._1 == 0.8)
    assert(!gates("doc_id_unique")._2 && gates("doc_id_unique")._1 == 0.6)
    assert(!gates("lang_known")._2 && gates("lang_known")._1 == 0.8)
    assert(!gates("n_chars_consistent")._2 &&
      gates("n_chars_consistent")._1 == 0.8) // only the 99-vs-5 row lies
    assert(!gates("n_chars_in_range")._2 && gates("n_chars_in_range")._1 == 0.8)
    assert(!gates("text_nonempty")._2 && gates("text_nonempty")._1 == 0.8)
  }

  test("bpe_coverage totals reconcile with the per-doc tokenize output") {
    val cov = operators.BpeOps.coverageBpe(spark, Sf).collect()
    val perDoc = operators.BpeOps.tokenizeBpe(spark, Sf)
      .agg(sum(col("n_words")), sum(col("n_pieces"))).collect()(0)
    assert(cov.map(_.getLong(1)).sum == perDoc.getLong(0))
    assert(cov.map(_.getLong(2)).sum == perDoc.getLong(1))
    cov.foreach { r =>
      assert(r.getDouble(4) >= 1.0)              // pieces_per_word
      val s = r.getDouble(5)                     // single_piece_share
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getLong(3) <= r.getLong(1))       // n_single <= n_words
    }
  }

  test("emb_outliers flags the strict bottom tail of each cluster") {
    val sizes = operators.AnnOps.clusterAssign(spark, Sf).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    val out = operators.AnnOps.embOutliers(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(2) < r.getDouble(3)))
    // the 10th-percentile cutoff keeps the flag set near a decile
    out.groupBy(_.getLong(1)).foreach { case (cid, rows) =>
      assert(rows.length <= math.ceil(sizes(cid) * 0.15) + 1,
        s"cluster $cid flagged ${rows.length} of ${sizes(cid)}")
    }
  }

  test("graph_source_rank conserves the node count and total mass") {
    val pr = GraphOps.pageRank(spark, Sf).collect()
    val sr = GraphOps.sourceRank(spark, Sf).collect()
    assert(sr.map(_.getLong(1)).sum == pr.length)
    assert(sr.map(_.getLong(2)).sum == pr.map(_.getLong(1)).sum)
    sr.foreach { r =>
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / r.getLong(1)) == 0.0)
    }
  }

  test("evt_transitions rows normalize to 1 per predecessor") {
    val rows = operators.EventOps.transitions(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val psum = rs.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-9, s"$prev rows sum to $psum")
    }
    // pair count = events minus one first-event per user
    val ev = Tables.events(spark, Sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("text_phrase_search matches a driver-side sliding-window recount") {
    val phrase = operators.TextOps.PhraseTerms
    val got = operators.TextOps.phraseSearch(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Tables.documents(spark, Sf).select("doc_id", "text")
      .collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        r.getLong(0) -> toks.sliding(phrase.size)
          .count(w => w.sameElements(phrase))
      }
      .filter(_._2 > 0).map { case (d, n) => d -> n.toLong }.toMap
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("phraseSearch extension hits are contained in prefix hits") {
    val prefix = operators.TextOps.phraseSearch(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // extending the phrase can only shrink per-doc hit counts
    val ext = operators.TextOps.phraseSearch(spark, Sf,
      operators.TextOps.PhraseTerms :+ "scan").collect()
    ext.foreach { r =>
      assert(prefix.getOrElse(r.getLong(0), 0L) >= r.getLong(1))
    }
  }

  test("evt_daily_anomaly rows satisfy the square-form z-test") {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, Sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .groupBy(_.getString(0))
    val flagged = operators.EventOps.dailyAnomaly(spark, Sf).collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      val series = daily(r.getString(0)).sortBy(_.getTimestamp(1).getTime)
      val idx = series.indexWhere(_.getTimestamp(1) == r.getTimestamp(1))
      val prev = series.slice(math.max(0, idx - 7), idx).map(_.getLong(2))
      assert(prev.length >= 3)
      val mean = prev.sum.toDouble / prev.length
      val variance = (prev.map(c => c * c).sum.toDouble -
        prev.sum.toDouble * prev.sum / prev.length) / prev.length
      val cnt = r.getLong(2)
      assert(cnt > mean && (cnt - mean) * (cnt - mean) > 4 * variance)
    }
  }

  test("text_typo_pairs equals the brute-force edit-distance pass") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = Tables.documents(spark, Sf).collect()
      .flatMap(_.getString(1).split(" ")).filter(_.nonEmpty).distinct.sorted
    val expected = (for {
      i <- vocab.indices; j <- (i + 1) until vocab.length
      d = lev(vocab(i), vocab(j)) if d <= operators.TextOps.TypoMaxDist
    } yield (vocab(i), vocab(j), d.toLong)).toSeq.sorted
    val got = operators.TextOps.typoPairs(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("doc_holdout_split is deterministic and near the requested rate") {
    val a = operators.CurationOps.holdoutSplit(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val b = operators.CurationOps.holdoutSplit(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(a.sameElements(b))
    val n = a.length
    val nVal = a.count(_._2 == "val")
    assert(a.map(_._2).toSet.subsetOf(Set("train", "val")))
    // salted-hash binomial: allow a wide band around 5%
    assert(nVal > 0 && nVal < n * 0.15, s"$nVal of $n in val")
  }

  test("corpus_drift: ranks contiguous, drift recomputed from raw counts") {
    val out = ProfileOps.corpusDrift(spark, Sf).collect()
    assert(out.nonEmpty)
    // per-lang totals derived independently from the raw table
    val toks = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok")).collect()
    val nBase = toks.filter(_.getLong(0) % 10 != 7)
      .groupBy(_.getString(1)).map { case (l, r) => l -> r.length.toLong }
    val nDelta = toks.filter(_.getLong(0) % 10 == 7)
      .groupBy(_.getString(1)).map { case (l, r) => l -> r.length.toLong }
    out.foreach { r =>
      val lang = r.getAs[String]("lang")
      val pB = r.getAs[Long]("c_base").toDouble / nBase(lang)
      val pD = r.getAs[Long]("c_delta").toDouble / nDelta(lang)
      assert(r.getAs[Double]("p_base") == pB)
      assert(r.getAs[Double]("p_delta") == pD)
      assert(r.getAs[Double]("drift") == math.abs(pD - pB))
    }
    out.groupBy(_.getAs[String]("lang")).values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq ==
        (1L to rows.length).toSeq)
    }
  }

  test("corpus_drift_summary: identical split distributions give zero L1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift")
      .toFile.getAbsolutePath
    // delta docs (id % 10 = 7) carry exactly the standing docs' texts,
    // so per-lang token distributions coincide and L1 must be 0
    Seq(
      (1L, "alpha beta beta", "en", "web", 15L),
      (2L, "gamma alpha", "en", "web", 11L),
      (7L, "alpha beta beta gamma alpha", "en", "web", 27L),
      (3L, "uno dos", "es", "web", 7L),
      (17L, "uno dos", "es", "web", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = ProfileOps.corpusDriftSummary(spark, dir).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Double]("l1") == 0.0,
        s"${r.getAs[String]("lang")} l1 ${r.getAs[Double]("l1")}")
      assert(r.getAs[Long]("new_tokens") == 0L)
    }
    // the real corpus: l1 within [0, 2], new_tokens <= vocab
    ProfileOps.corpusDriftSummary(spark, Sf).collect().foreach { r =>
      val l1 = r.getAs[Double]("l1")
      assert(l1 >= 0.0 && l1 <= 2.0)
      assert(r.getAs[Long]("new_tokens") <= r.getAs[Long]("vocab"))
    }
  }

  test("evt_attribution pairs respect the band and user equality") {
    val rows = operators.EventOps.attribution(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getTimestamp(2).getTime
      val c = r.getTimestamp(4).getTime
      assert(c <= p && c > p - GraphOpsSpecHelpers.WindowMs)
      assert(r.getLong(5) == (p - c) / 60000L)
    }
  }
}

private object GraphOpsSpecHelpers {
  val WindowMs: Long =
    operators.EventOps.AttributionWindowHours.toLong * 3600L * 1000L
}
