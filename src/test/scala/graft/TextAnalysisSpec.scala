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
}
