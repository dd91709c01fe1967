package graft

import graft.operators.CurationOps
import org.apache.spark.sql.functions._

class CurationSpec extends GraftSpec {

  test("split assignment is content-keyed: dup-coherent and growth-stable") {
    val full = CurationOps.splitAssign(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // byte-identical duplicates MUST share a split (no exact-dup
    // train/test leakage by construction) — pinned on a frame whose
    // ids differ but whose texts collide
    import spark.implicits._
    val dup = CurationOps.splitAssignOn(
        Seq((1L, "the same text"), (999L, "the same text"),
          (2L, "another text")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(dup(1L) == dup(999L), "identical texts diverged across splits")
    // assignment must be a pure per-row function: recomputing on an
    // arbitrary subset cannot move anyone
    val half = CurationOps.splitAssign(spark, Sf)
      .filter(col("doc_id") % 2 === 0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
    half.foreach { case (id, v) => assert(full(id) == v) }
    // 98/1/1 in expectation; loose band, exactness is the oracle's job
    val frac = full.values.count(_._2 == "train").toDouble / full.size
    assert(frac > 0.9 && frac <= 1.0, s"train fraction off: $frac")
  }

  test("k-anon ladder picks the MINIMAL level reaching k, never below k") {
    val k = CurationOps.KAnon
    val rows = CurationOps.kAnonLadder(spark, Sf).collect()
    val g0 = rows.groupBy(r => (r.getInt(1), r.getString(2), r.getLong(3)))
      .view.mapValues(_.length).toMap
    val g1 = rows.groupBy(r => (r.getInt(1), r.getString(2)))
      .view.mapValues(_.length).toMap
    val g2 = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    rows.foreach { r =>
      val (n0, n1, n2) = (g0((r.getInt(1), r.getString(2), r.getLong(3))),
        g1((r.getInt(1), r.getString(2))), g2(r.getString(2)))
      val want = if (n0 >= k) 0L else if (n1 >= k) 1L else if (n2 >= k) 2L else 3L
      assert(r.getLong(4) == want, s"level not minimal for ${r.getLong(0)}")
      if (r.getLong(4) < 3L) assert(r.getLong(5) >= k)
    }
    // the ladder must actually be exercised: some rows generalize
    assert(rows.exists(_.getLong(4) > 0L))
    assert(rows.exists(_.getLong(4) == 0L) || rows.exists(_.getLong(4) == 1L))
  }

  test("incremental dedup verdicts are consistent") {
    val df = CurationOps.dedupIncremental(spark, Sf).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val keep = r.getAs[Boolean]("keep")
      val e = r.getAs[Boolean]("is_exact_dup")
      val n = r.getAs[Boolean]("is_near_dup")
      assert(keep == (!e && !n))
      assert(r.getAs[Long]("doc_id") % 10 == 7)
    }
  }

  test("bloom incremental dedup: identical verdicts, bloom actually prunes") {
    val plain = CurationOps.dedupIncremental(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    val bloom = CurationOps.dedupIncrementalBloom(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(bloom.toSeq == plain.toSeq,
      "bloom pre-filter changed incremental-dedup verdicts")
    // the filter must reject most of the non-dup majority (3% FPP):
    // count might-contain survivors directly
    val docs = Tables.documents(spark, Sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val blm = graft.functions.BloomFns.build(
      corpus.select(md5(col("text")).as("ck")), col("ck"),
      math.max(corpus.count(), 1L))
    val incoming = docs.filter(col("doc_id") % 10 === 7)
      .select(md5(col("text")).as("ck"))
    val survivors = incoming
      .filter(graft.functions.BloomFns.mightContain(blm, col("ck"))).count()
    val exactDups = plain.count(_._2)
    assert(survivors >= exactDups, "bloom dropped a true member")
    assert(survivors < incoming.count(),
      s"bloom pruned nothing ($survivors of ${incoming.count()})")
  }

  test("bloom filter: zero false negatives, bounded false-positive rate") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val members = (1 to 2000).map(_ => rnd.nextString(12)).distinct
    val outsiders = (1 to 2000).map(_ => "out:" + rnd.nextString(12)).distinct
    val blm = graft.functions.BloomFns.build(
      members.toDF("v"), col("v"), members.size.toLong)
    val fn = members.toDF("v")
      .filter(!graft.functions.BloomFns.mightContain(blm, col("v"))).count()
    assert(fn == 0, s"$fn false negatives — bloom contract broken")
    val fp = outsiders.toDF("v")
      .filter(graft.functions.BloomFns.mightContain(blm, col("v"))).count()
    assert(fp.toDouble / outsiders.size < 0.15,
      s"false-positive rate ${fp.toDouble / outsiders.size} too high")
  }

  test("curation keeps only best-of-checksum, lang-matched, quality-passing docs") {
    val df = CurationOps.curate(spark, Sf)
    val kept = df.filter(col("keep")).collect()
    assert(kept.nonEmpty && kept.length < 500)
    kept.foreach(r => assert(r.getAs[Double]("score") >= 0.5))
  }

  test("stratified sample is k-per-stratum and deterministic") {
    val a = CurationOps.sampleStratified(spark, Sf).collect()
    val b = CurationOps.sampleStratified(spark, Sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val perLang = a.groupBy(_.getAs[String]("lang")).map { case (_, rs) => rs.length }
    perLang.foreach(n => assert(n <= 50))
    assert(a.forall(_.getAs[Long]("rnk") <= 50))
  }

  test("weighted mixture honors external quotas and drops unlisted sources") {
    import graft.operators.CurationOps
    val rows = CurationOps.mixtureWeighted(spark, Sf,
      CurationOps.demoWeights(spark)).collect()
    val listed = Set("src0", "src2", "src3", "src5", "src7", "src12", "src19")
    assert(rows.map(_.getAs[String]("source")).toSet.subsetOf(listed))
    val bySource = rows.groupBy(_.getAs[String]("source"))
    // every emitted rank respects that source's own quota, not the max
    rows.foreach(r =>
      assert(r.getAs[Long]("rnk") <= r.getAs[Long]("quota")))
    // a small quota binds exactly when the stratum has enough docs
    assert(bySource.get("src7").forall(_.length <= 5))
  }

  test("decontamination flags a doc whose text IS an eval item, fully") {
    import spark.implicits._
    import graft.operators.CurationOps
    // eval set = two real corpus documents verbatim: their own doc must
    // be flagged with n_hits == its full shingle count (hit_frac 1.0)
    val sample = Tables.documents(spark, Sf).select("doc_id", "text")
      .filter(col("doc_id").isin(3L, 17L)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val evalSet = sample.toSeq.toDF("eval_id", "text")
    val out = CurationOps.decontaminate(spark, Sf, evalSet, minHits = 2)
      .collect()
    for ((id, _) <- sample) {
      val self = out.filter(r => r.getAs[Long]("doc_id") == id &&
        r.getAs[Long]("eval_id") == id)
      assert(self.length == 1, s"doc $id not flagged against itself")
      assert(self.head.getAs[Double]("hit_frac") == 1.0)
    }
    // flagged rows always respect the threshold
    out.foreach(r => assert(r.getAs[Long]("n_hits") >= 2))
  }

  test("keep-best keeps exactly one member per cluster, accounting for all docs") {
    import graft.operators.{CurationOps, DedupOps}
    val kept = CurationOps.dedupKeepBest(spark, Sf).collect()
    val clusters = DedupOps.dedupClusters(spark, Sf).collect()
    // one keeper per component, each a member of its own component
    assert(kept.map(_.getAs[Long]("component")).distinct.length == kept.length)
    val membership = clusters.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("component"))).toSet
    kept.foreach(r => assert(membership(
      (r.getAs[Long]("keeper_id"), r.getAs[Long]("component")))))
    // dropped + kept accounts for the whole corpus
    val total = kept.map(r => r.getAs[Long]("n_dropped") + 1L).sum
    assert(total == Tables.documents(spark, Sf).count())
  }

  test("corpus_build_incremental == full rebuild, row for row") {
    import graft.operators.CurationOps
    // the whole point of the delta algebra: Bloom-gated keeper
    // resolution + mini-CC merge + touched-entity recompute must
    // reproduce the from-scratch manifest EXACTLY
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toList).toList
    val full = rows(CurationOps.corpusBuild(spark, Sf))
    val inc = rows(CurationOps.corpusBuildIncremental(spark, Sf))
    assert(full.nonEmpty)
    assert(inc == full,
      s"incremental diverged; first diff: ${
        inc.zip(full).find { case (a, b) => a != b }}")
  }

  test("corpus_build manifest composes its stages consistently") {
    import graft.operators.CurationOps
    import org.apache.spark.sql.functions._
    val m = CurationOps.corpusBuild(spark, Sf).collect()
    assert(m.nonEmpty)
    // every manifest doc is its cluster's keeper
    val keepers = CurationOps.dedupKeepBest(spark, Sf).collect()
      .map(_.getAs[Long]("keeper_id")).toSet
    m.foreach(r => assert(keepers(r.getAs[Long]("doc_id"))))
    // exact-dedup stage held: one doc per content checksum
    val texts = Tables.documents(spark, Sf)
      .select(col("doc_id"), md5(col("text")).as("ck")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cks = m.map(r => texts(r.getAs[Long]("doc_id")))
    assert(cks.distinct.length == cks.length, "manifest contains exact dups")
    // mixture quotas respected per source
    m.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val quota = rows.head.getAs[Long]("quota")
      assert(rows.length <= quota)
      rows.foreach(r => assert(r.getAs[Long]("rnk") <= quota))
    }
    // packing: cum_tokens strictly increases with doc_id within
    // (lang, bucket) and bin_id is its integer-budget image
    m.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket")))
      .foreach { case (_, rows) =>
        val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
        var prev = 0L
        sorted.foreach { r =>
          val c = r.getAs[Long]("cum_tokens")
          assert(c == prev + r.getAs[Long]("n_tokens"))
          assert(r.getAs[Long]("bin_id") == (c - 1) / 256)
          prev = c
        }
      }
  }

  test("doc_pareto_front equals the quadratic skyline definition") {
    val pts = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        (r.getLong(0), toks.length.toLong,
          toks.distinct.length.toDouble / toks.length.toDouble)
      }
    val exp = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, px, py) =>
        px >= x && py >= y && (px > x || py > y)
      }
    }.sortBy { case (id, x, _) => (-x, id) }.toSeq
    val got = CurationOps.paretoFront(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == exp, "distributive skyline diverges from the definition")
    assert(got.nonEmpty && got.size < pts.length,
      "degenerate fixture: front empty or everything on the front")
    // the front is a true anti-chain: no member dominates another
    for ((_, x1, y1) <- got; (_, x2, y2) <- got)
      assert(!(x1 >= x2 && y1 >= y2 && (x1 > x2 || y1 > y2)) ||
        (x1 == x2 && y1 == y2))
  }
}
