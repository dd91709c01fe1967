package graft

import graft.operators.{DedupOps, TextOps}
import org.apache.spark.sql.functions._

/** D48 (C4-style global line dedup) + D49 (Gopher rule battery). */
class LineGopherSpec extends GraftSpec {

  test("dedup_lines: line counts, keep-first accounting, dup docs emptied") {
    val out = DedupOps.dedupLines(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    // independent re-derivation of the line grid via SQL (not the
    // operator's column pipeline): n_lines == ceil(n_tok / LineTok)
    val toks = Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tok")).toMap
    assert(out.keySet == toks.keySet)
    toks.foreach { case (id, n) =>
      val expLines = (n + DedupOps.LineTok - 1) / DedupOps.LineTok
      assert(out(id).getAs[Long]("n_lines") == expLines, s"doc $id")
      val r = out(id)
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_lines"))
    }

    // global accounting: total kept == number of DISTINCT line texts
    // (each distinct line keeps exactly one occurrence corpus-wide) —
    // derived independently through SQL string functions
    Tables.documents(spark, Sf).createOrReplaceTempView("dl_docs")
    val distinctLines = spark.sql(
      s"""SELECT COUNT(DISTINCT line) AS c FROM (
         |  SELECT explode(transform(
         |    sequence(0, CAST(floor((size(split(text,' ')) - 1) /
         |      ${DedupOps.LineTok}) AS INT)),
         |    i -> concat_ws(' ', slice(split(text,' '),
         |      i * ${DedupOps.LineTok} + 1, ${DedupOps.LineTok})))) AS line
         |  FROM dl_docs)""".stripMargin).head().getAs[Long]("c")
    assert(out.values.map(_.getAs[Long]("n_kept")).sum == distinctLines)

  }

  test("dedup_lines: constructed dups — keep-first within and across docs") {
    import spark.implicits._
    val lineA = (1 to 10).map(i => s"a$i").mkString(" ")   // one full line
    val lineB = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$lineA $lineB"),          // doc 1: A,B — both first ⇒ kept
      (2L, s"$lineB $lineA"),          // doc 2: B,A — both dups ⇒ 0 kept
      (3L, s"$lineA $lineA"),          // doc 3: A twice — both dups of doc 1
      (4L, "fresh tokens only here")   // partial line, unique ⇒ kept
    ).toDF("doc_id", "text")
    val out = DedupOps.dedupLinesOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_kept") == 2L)
    assert(out(1L).getAs[String]("clean_md5") == md5hex(s"$lineA $lineB"))
    assert(out(2L).getAs[Long]("n_kept") == 0L)
    assert(out(2L).getAs[String]("clean_md5") == md5hex(""))
    assert(out(3L).getAs[Long]("n_lines") == 2L)
    assert(out(3L).getAs[Long]("n_kept") == 0L)   // dups of doc 1's A
    assert(out(4L).getAs[Long]("n_lines") == 1L)
    assert(out(4L).getAs[Long]("n_kept") == 1L)
    assert(out(4L).getAs[String]("clean_md5") == md5hex("fresh tokens only here"))
    // within-doc first occurrence: a doc that introduces a line twice
    // keeps only the first copy
    val solo = DedupOps.dedupLinesOn(
      Seq((7L, s"$lineB $lineB")).toDF("doc_id", "text")).collect().head
    assert(solo.getAs[Long]("n_lines") == 2L)
    assert(solo.getAs[Long]("n_kept") == 1L)
    assert(solo.getAs[String]("clean_md5") == md5hex(lineB))
  }

  test("doc_similar: k-bounded, rank-consistent, symmetric scores") {
    val rows = TextOps.docSimilar(spark, Sf).collect()
    assert(rows.nonEmpty)
    val byA = rows.groupBy(_.getAs[Long]("a_id"))
    byA.foreach { case (a, rs) =>
      assert(rs.length <= TextOps.SimilarK, s"doc $a over k")
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ==
        (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          // score emits as double (the hash-stable projection); the
          // exact-decimal ordering happened inside the heap
          val sx = x.getAs[Double]("score")
          val sy = y.getAs[Double]("score")
          assert(sx > sy || (sx == sy &&
            x.getAs[Long]("b_id") < y.getAs[Long]("b_id")))
        case _ =>
      }
      rs.foreach(r => assert(r.getAs[Long]("n_shared") >= 1L))
    }
    // the pair score is symmetric: whenever both orientations survive
    // their respective top-k cuts they carry the identical score
    val score = rows.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
      r.getAs[Double]("score")).toMap
    var checked = 0
    score.foreach { case ((a, b), s) =>
      score.get((b, a)).foreach { s2 =>
        assert(s == s2, s"asymmetric $a<->$b"); checked += 1
      }
    }
    assert(checked > 0, "no mutual pairs to check symmetry on")
  }

  test("emb_hard_negatives: labels differ, ranks consistent, sims exact") {
    import graft.operators.AnnOps
    val emb = Tables.embeddings(spark, Sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("label"), r.getAs[Seq[Float]]("embedding").toArray))
      .toMap
    val rows = AnnOps.hardNegatives(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.length <= 5)
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getAs[Double]("sim") >= b.getAs[Double]("sim")
        case _ => true
      })
      sorted.foreach { r =>
        val c = r.getAs[Long]("c_id")
        assert(r.getAs[Int]("q_label") == emb(q)._1)
        assert(r.getAs[Int]("c_label") == emb(c)._1)
        assert(r.getAs[Int]("q_label") != r.getAs[Int]("c_label"))
        // exact cosine re-derivation in plain Scala
        val (qa, ca) = (emb(q)._2.map(_.toDouble), emb(c)._2.map(_.toDouble))
        def dot(x: Array[Double], y: Array[Double]) =
          x.zip(y).map { case (a, b) => a * b }.sum
        val expSim = dot(qa, ca) /
          (math.sqrt(dot(qa, qa)) * math.sqrt(dot(ca, ca)))
        assert(math.abs(r.getAs[Double]("sim") - expSim) < 1e-9,
          s"sim mismatch q=$q c=$c")
      }
    }
  }

  test("doc_lm_tiers: assignment consistent with cutoffs, thirds roughly balanced") {
    val rows = TextOps.lmTiers(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Double]("bits_per_trans")
      val (h, m) = (r.getAs[Double]("c_head"), r.getAs[Double]("c_mid"))
      assert(h <= m)
      val exp = if (b <= h) "head" else if (b <= m) "middle" else "tail"
      assert(r.getAs[String]("tier") == exp, s"doc ${r.getAs[Long]("doc_id")}")
    }
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val n = rs.length
      if (n >= 9) {
        val heads = rs.count(_.getAs[String]("tier") == "head")
        assert(heads >= n / 5 && heads <= n / 2,
          s"$lang head share off: $heads/$n")
      }
    }
  }

  test("doc_gopher_rules: verdicts match a plain-Scala re-derivation") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("n_chars"))).toSeq
    val out = TextOps.gopherRules(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == docs.size)
    docs.foreach { case (id, text, nChars) =>
      val toks = text.split(" ", -1)
      val nTok = toks.length.toLong
      val tokChars = toks.map(_.length.toLong).sum
      val alpha = toks.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
      val stops = toks.count(stop.contains).toLong
      val digits = text.count(c => c >= '0' && c <= '9').toLong
      val r = out(id)
      assert(r.getAs[Long]("n_tok") == nTok, s"doc $id n_tok")
      assert(r.getAs[Long]("tok_chars") == tokChars, s"doc $id tok_chars")
      assert(r.getAs[Long]("alpha_cnt") == alpha, s"doc $id alpha")
      assert(r.getAs[Long]("stop_hits") == stops, s"doc $id stops")
      assert(r.getAs[Long]("digit_cnt") == digits, s"doc $id digits")
      assert(r.getAs[Boolean]("r_word_count") == (nTok >= 5 && nTok <= 1000))
      assert(r.getAs[Boolean]("r_mean_word_len") ==
        (3 * nTok <= tokChars && tokChars <= 10 * nTok))
      assert(r.getAs[Boolean]("r_alpha_share") == (5 * alpha >= 4 * nTok))
      assert(r.getAs[Boolean]("r_stopwords") == (stops >= 2))
      assert(r.getAs[Boolean]("r_digit_share") == (10 * digits <= nChars))
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Boolean]("r_word_count") && r.getAs[Boolean]("r_mean_word_len")
          && r.getAs[Boolean]("r_alpha_share") && r.getAs[Boolean]("r_stopwords")
          && r.getAs[Boolean]("r_digit_share")))
    }
  }
}
