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
}
