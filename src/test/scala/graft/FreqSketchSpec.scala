package graft

import graft.functions.FreqSketch
import graft.operators.TextOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** G11/D29b: Misra–Gries frequency sketch. The MG bound is
  * deterministic and partitioning-independent even though the exact
  * counter VALUES are not — so the spec pins the guarantees (never
  * overcount, undercount ≤ N/(cap+1), completeness above the
  * threshold) under multiple partitionings, plus exactness when the
  * sketch never overflows.
  */
class FreqSketchSpec extends GraftSpec {

  private def sketchOf(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(FreqSketch.mgSketch(col("s"), cap).as("sk"))
      .select(explode(col("sk")))
      .collect()
      .map { case Row(Row(k: String, c: Long)) => k -> c }.toMap

  test("MG sketch is exact when capacity covers the key space") {
    import spark.implicits._
    val data = Seq.tabulate(1000)(i => s"k${i % 7}").toDF("s")
    for (parts <- Seq(1, 5)) {
      val got = sketchOf(data.repartition(parts), 16)
      val want = (0 until 7).map(i => s"k$i" -> (1000 / 7 + (if (i < 1000 % 7) 1 else 0)).toLong).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("MG guarantees hold under overflow, for any partitioning") {
    import spark.implicits._
    // zipf-ish: key j appears ~N/j times
    val raw = (1 to 40).flatMap(j => Seq.fill(2000 / j)(s"z$j"))
    val truth = raw.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = raw.size.toLong
    val cap = 8
    val bound = n / (cap + 1)
    for (parts <- Seq(1, 3, 11)) {
      val got = sketchOf(raw.toDF("s").repartition(parts), cap)
      assert(got.size <= cap)
      got.foreach { case (k, est) =>
        assert(est <= truth(k), s"overcounted $k: $est > ${truth(k)} (parts=$parts)")
        assert(truth(k) - est <= bound,
          s"undercounted $k beyond N/(cap+1): ${truth(k)} - $est > $bound (parts=$parts)")
      }
      truth.filter(_._2 > bound).keys.foreach { k =>
        assert(got.contains(k), s"heavy key $k missing (parts=$parts)")
      }
    }
  }

  test("text_vocab_sketch: per-language guarantees vs the exact vocabulary at sf0.001") {
    val toks = Tables.documents(spark, Sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val truth = toks.groupBy(identity).map { case (kt, v) => kt -> v.size.toLong }
    val nLang = toks.groupBy(_._1).map { case (l, v) => l -> v.size.toLong }
    val cap = 64
    // full sketch (k = cap) so completeness is checked against the
    // whole retained set, not the display slice
    val rows = TextOps.vocabSketch(spark, Sf, capacity = cap, k = cap).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, tok, est) = (r.getString(0), r.getString(1), r.getLong(2))
      val t = truth((lang, tok))
      val bound = nLang(lang) / (cap + 1)
      assert(est <= t, s"overcount $lang/$tok")
      assert(t - est <= bound, s"undercount $lang/$tok beyond bound")
    }
    // completeness: every token above the per-language threshold is in
    // the sketch
    val present = rows.map(r => (r.getString(0), r.getString(1))).toSet
    truth.foreach { case ((lang, tok), t) =>
      if (t > nLang(lang) / (cap + 1))
        assert(present((lang, tok)), s"heavy token $lang/$tok missing")
    }
    // ranks are 1..n per language, counts non-increasing
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length.toLong))
      val cnts = sorted.map(_.getLong(2))
      assert(cnts.zip(cnts.drop(1)).forall { case (a, b) => a >= b })
    }
  }
}
