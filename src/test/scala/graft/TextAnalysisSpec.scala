package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends GraftSpec {

  test("lengthStatsApprox tracks the exact percentiles within tolerance") {
    val exact = TextOps.lengthStats(spark, Sf).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val approx = TextOps.lengthStatsApprox(spark, Sf).collect()
    assert(approx.length == exact.size)
    val stats = Seq("chars_p10", "chars_p50", "chars_p90",
      "tok_p10", "tok_p50", "tok_p90")
    approx.foreach { a =>
      val lang = a.getAs[String]("lang")
      val e = exact(lang)
      assert(a.getAs[Long]("n_docs") == e.getAs[Long]("n_docs"))
      stats.foreach { s =>
        val av = a.getAs[Double](s)
        val ev = e.getAs[Double](s)
        // approx_percentile returns a real element within sketch rank
        // error; the exact twin interpolates — allow the local gap
        assert(math.abs(av - ev) <= math.max(3.0, 0.15 * ev),
          s"$lang.$s: approx $av vs exact $ev")
      }
    }
  }

  test("lengthStatsApprox at high accuracy brackets the exact order stats") {
    // percentile values must be monotone within each row for both twins
    for (df <- Seq(TextOps.lengthStats(spark, Sf),
        TextOps.lengthStatsApprox(spark, Sf))) {
      df.collect().foreach { r =>
        assert(r.getAs[Double]("chars_p10") <= r.getAs[Double]("chars_p50"))
        assert(r.getAs[Double]("chars_p50") <= r.getAs[Double]("chars_p90"))
        assert(r.getAs[Double]("tok_p10") <= r.getAs[Double]("tok_p50"))
        assert(r.getAs[Double]("tok_p50") <= r.getAs[Double]("tok_p90"))
      }
    }
  }

  test("doc_keywords: k per doc, score == tf*N/df, rare tokens outrank common") {
    val kw = TextOps.docKeywords(spark, Sf, k = 3)
    val nDocs = Tables.documents(spark, Sf).count()
    val byDoc = kw.collect().groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { rows =>
      assert(rows.length <= 3)
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      sorted.foreach { r =>
        val tf = r.getAs[Long]("tf"); val df = r.getAs[Long]("df")
        assert(df >= 1 && df <= nDocs)
        assert(r.getAs[Double]("score") == (tf * nDocs).toDouble / df.toDouble)
      }
      // rnk ordering is score-descending
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("score") >= b.getAs[Double]("score"))
        case _ =>
      }
    }
  }

  test("inverted postings: sorted, entry count == df, tfs sum to total_tf") {
    TextOps.invertedPostings(spark, Sf).collect().foreach { r =>
      val entries = r.getAs[String]("postings").split(" ")
      assert(entries.length == r.getAs[Long]("df"))
      assert(entries.map(_.split(":")(1).toLong).sum == r.getAs[Long]("total_tf"))
      val ids = entries.map(_.split(":")(0).toLong)
      assert(ids.zip(ids.tail).forall(p => p._1 < p._2),
        s"postings for ${r.getAs[String]("tok")} not doc-sorted")
    }
  }

  test("doc_search_bm25: ranked hits all contain a query term, scores ordered") {
    val hits = TextOps.docSearchBm25(spark, Sf).collect()
    assert(hits.nonEmpty && hits.length <= 20)
    assert(hits.map(_.getAs[Long]("rnk")).toSeq == (1L to hits.length))
    hits.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("score") >= b.getAs[Double]("score"))
      case _ =>
    }
    val texts = Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    hits.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).split(" ").toSet
      assert(r.getAs[Double]("score") > 0.0)
      assert(TextOps.Bm25Terms.exists(toks.contains),
        s"doc ${r.getAs[Long]("doc_id")} ranked but contains no query term")
    }
  }

  test("text_collocations: assoc == c_ab*N/(c_a*c_b), counts consistent") {
    val co = TextOps.collocations(spark, Sf, k = 10, minCount = 2)
    co.collect().foreach { r =>
      val cab = r.getAs[Long]("c_ab"); val ca = r.getAs[Long]("c_a")
      val cb = r.getAs[Long]("c_b")
      assert(cab >= 2 && cab <= math.min(ca, cb),
        s"bigram count $cab exceeds a unigram count ($ca, $cb)")
      assert(r.getAs[Double]("assoc") > 0.0)
    }
    // per-lang rnk is 1..n contiguous
    co.collect().groupBy(_.getAs[String]("lang")).values.foreach { rows =>
      val rnks = rows.map(_.getAs[Long]("rnk")).sorted
      assert(rnks.toSeq == (1L to rnks.length).toSeq)
    }
  }

  test("rrfFuse: fusing a ranking with itself preserves its order") {
    import spark.implicits._
    val r = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 10L, 1L), (2L, 13L, 2L))
      .toDF("key", "item", "rnk")
    val out = TextOps.rrfFuse(
      r.withColumnRenamed("rnk", "rnk_a"),
      r.withColumnRenamed("rnk", "rnk_b")).collect()
    out.foreach { row =>
      assert(row.getAs[Long]("r_a") == row.getAs[Long]("r_b"))
      assert(row.getAs[Long]("rnk") == row.getAs[Long]("r_a"))
      // rrf = 2/(C + r), recomputed
      val expect = 2.0 / (TextOps.RrfC + row.getAs[Long]("r_a"))
      assert(row.getAs[Double]("rrf") == expect)
    }
  }

  test("rrfFuse: an item both systems rank beats single-system items at equal rank") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("key", "item", "rnk_a")
    val b = Seq((1L, 10L, 1L), (1L, 12L, 2L)).toDF("key", "item", "rnk_b")
    val out = TextOps.rrfFuse(a, b).collect()
      .map(r => r.getAs[Long]("item") -> r.getAs[Long]("rnk")).toMap
    assert(out(10L) == 1L) // in both top lists at rank 1
    // 11 and 12 each have one rank-2 contribution; tie broken by item
    assert(out(11L) == 2L && out(12L) == 3L)
  }

  test("doc_similar_rrf: invariants and agreement with the component rankings") {
    val out = TextOps.docSimilarRrf(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ri = r.getAs[Long]("r_idf"); val rj = r.getAs[Long]("r_jac")
      assert(ri >= 0 && ri <= TextOps.RrfDepth)
      assert(rj >= 0 && rj <= TextOps.RrfDepth)
      assert(ri > 0 || rj > 0, "candidate in neither top list")
      val expect =
        (if (ri > 0) 1.0 / (TextOps.RrfC + ri) else 0.0) +
        (if (rj > 0) 1.0 / (TextOps.RrfC + rj) else 0.0)
      assert(r.getAs[Double]("rrf") == expect)
    }
    // anchors only, ranks contiguous per anchor
    out.groupBy(_.getAs[Long]("a_id")).foreach { case (a, rows) =>
      assert(a % 20 == 3)
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq ==
        (1L to rows.length).toSeq)
    }
    // a candidate ranked 1 by BOTH systems must be the fused top-1
    out.filter(r => r.getAs[Long]("r_idf") == 1 && r.getAs[Long]("r_jac") == 1)
      .foreach(r => assert(r.getAs[Long]("rnk") == 1))
  }

  test("doc_classify_lang: argmax + scores equal an independent in-memory NB; held-out accuracy beats the prior") {
    import graft.functions.IntMath.qlog2
    // the weak label in plain Scala: per-profile occurrence counts,
    // argmax with the profile-order tie-break (predLangCol's contract)
    def weakLabel(toks: Seq[String]): String = {
      val counts = operators.TextOps.LangProfiles.map { case (l, ws) =>
        l -> toks.count(ws.contains) }
      val m = counts.map(_._2).max
      counts.find(_._2 == m).get._1
    }
    // independent NB: plain Scala maps over the same split/tokens,
    // labeled by the TEXT-DERIVED weak label (the r11 contract)
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(2).split(" ", -1).toSeq))
      .map { case (id, toks) => (id, weakLabel(toks), toks) }
    val train = docs.filter(_._1 % 10 != 7)
    val test = docs.filter(_._1 % 10 == 7)
    assert(train.nonEmpty && test.nonEmpty)
    val cc = scala.collection.mutable.Map[(String, String), Long]()
    train.foreach { case (_, s, toks) =>
      toks.foreach(t => cc((s, t)) = cc.getOrElse((s, t), 0L) + 1L) }
    val nS = cc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = cc.keys.map(_._2).toSet.size.toLong
    val nd = train.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ndTot = train.size.toLong
    val classes = nd.keys.toSeq.sorted
    def score(s: String, toks: Seq[String]): Long = {
      val base = qlog2(nd(s)) - qlog2(ndTot)
      val pen = qlog2(nS(s) + v)
      base + toks.map(t =>
        (if (cc.contains((s, t))) qlog2(cc((s, t)) + 1) else 0L) - pen).sum
    }
    val wantPred = test.map { case (id, actual, toks) =>
      val best = classes.map(s => (s, score(s, toks)))
        .minBy { case (s, sc) => (-sc, s) }
      id -> (best._1, best._2, actual)
    }.toMap
    val got = operators.TextOps.classifyLang(spark, Sf).collect()
    assert(got.length == test.length)
    got.foreach { r =>
      val (p, sc, actual) = wantPred(r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("pred_lang") == p)
      assert(r.getAs[Long]("score_q10") == sc)
      assert(r.getAs[String]("true_lang") == actual)
      assert(r.getAs[Boolean]("correct") == (p == actual))
    }
    // the label is a genuine function of the text, so the learned
    // model must beat the class prior on the held-out split — the
    // assertion the generator's text-independent lang column could
    // never support (r10 honesty note, closed in r11)
    val prior = nd.values.max.toDouble / ndTot
    val acc = got.count(_.getAs[Boolean]("correct")).toDouble / got.length
    assert(acc > prior, s"held-out accuracy $acc not above prior $prior")
  }
}
