package graft

import graft.functions.{IntMath, StrHash}
import graft.operators.DsirOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** D40: DSIR importance resampling. The weight check recomputes every
  * crawl doc's score with an INDEPENDENT driver implementation (plain
  * HashMaps over driver-side StrHash/qlog2 calls — no Spark plan, no
  * shared SQL), so the operator and its oracle can't share a bug; the
  * resample check re-derives the Gumbel keys and the top-k from the
  * weights independently.
  */
class DsirSpec extends GraftSpec {

  private def h(s: String): Long =
    StrHash.hash64(UTF8String.fromString(s))

  private def bucketOf(feat: String): Long = {
    val b = h(feat) % DsirOps.Buckets
    if (b < 0) b + DsirOps.Buckets else b
  }

  /** Driver twin: per-doc hashed unigram+bigram bucket counts. */
  private def docBuckets(text: String): Map[Long, Long] = {
    val toks = text.split(" ", -1).toSeq
    val feats = toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
    feats.groupBy(bucketOf).map { case (b, fs) => b -> fs.size.toLong }
  }

  test("doc_importance_weights matches an independent hashmap scorer at sf0.001") {
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val target = docs.filter(_._1 % 10 != 7)
    val raw = docs.filter(_._1 % 10 == 7)
    assert(raw.nonEmpty && target.nonEmpty)

    val tc = scala.collection.mutable.HashMap.empty[Long, Long]
    target.foreach(d => docBuckets(d._2).foreach { case (b, n) =>
      tc.update(b, tc.getOrElse(b, 0L) + n) })
    val rc = scala.collection.mutable.HashMap.empty[Long, Long]
    raw.foreach(d => docBuckets(d._2).foreach { case (b, n) =>
      rc.update(b, rc.getOrElse(b, 0L) + n) })
    val nt = tc.values.sum + DsirOps.Buckets
    val nr = rc.values.sum + DsirOps.Buckets
    def score(b: Long): Long =
      (IntMath.qlog2(tc.getOrElse(b, 0L) + 1) - IntMath.qlog2(nt)) -
        (IntMath.qlog2(rc(b) + 1) - IntMath.qlog2(nr))

    val want = raw.map { case (id, text) =>
      val bs = docBuckets(text)
      (id, bs.values.sum, bs.map { case (b, n) => n * score(b) }.sum)
    }.sortBy(_._1).toSeq

    val got = DsirOps.importanceWeights(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // the selection signal is non-trivial: weights differ across docs
    assert(got.map(_._3).distinct.size > 1)
  }

  test("the base-2 Gumbel draw is distributed as a Gumbel and samples ∝ weight") {
    def g(id: Long): Double = {
      val u = (IntMath.mix64(id + DsirOps.Salt) >>> 11) + 1
      val l = 53L * 1024 - IntMath.qlog2(u)
      (10240L - IntMath.qlog2(math.max(l, 1L))) / 1024.0
    }
    // distribution moments of G = −log2(−log2 U): median = G(½) = 0,
    // mean = (γ + ln ln 2)/ln 2 ≈ 0.304 bits; qlog2 bias < 0.09 bits
    val n = 100000
    val draws = Array.tabulate(n)(i => g(i.toLong * 7919 + 13))
    val sorted = draws.sorted
    assert(math.abs(sorted(n / 2)) < 0.1,
      s"median ${sorted(n / 2)} not ~0")
    val mean = draws.sum / n
    assert(math.abs(mean - 0.304) < 0.1, s"mean $mean not ~0.304")
    // Gumbel-max over log2-weights {0, 1, 2} (w = 1, 2, 4) must pick
    // each item ∝ w: expected frequencies 1/7, 2/7, 4/7
    val wins = new Array[Long](3)
    val trials = 20000
    for (t <- 0 until trials) {
      val keys = Array.tabulate(3)(j => j * 1.0 + g(3L * t + j))
      wins(keys.indices.maxBy(keys)) += 1
    }
    val freq = wins.map(_.toDouble / trials)
    val want = Array(1.0 / 7, 2.0 / 7, 4.0 / 7)
    freq.zip(want).foreach { case (f, w) =>
      assert(math.abs(f - w) < 0.03, s"freqs ${freq.toSeq} vs ∝-weight ${want.toSeq}")
    }
  }

  test("doc_importance_resample is the Gumbel-top-k of the weights, deterministically") {
    val weights = DsirOps.importanceWeights(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap

    // independent driver re-derivation of the base-2 Gumbel draw
    def gumbel(id: Long): Long = {
      val u = (IntMath.mix64(id + DsirOps.Salt) >>> 11) + 1
      val l = 53L * 1024 - IntMath.qlog2(u)
      10240L - IntMath.qlog2(math.max(l, 1L))
    }
    val want = weights.toSeq
      .map { case (id, w) => (id, w + gumbel(id)) }
      .sortBy { case (id, k) => (-k, id) }
      .take(DsirOps.SampleK)

    val got = DsirOps.importanceResample(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    assert(got.map(t => (t._1, t._2)).toSeq == want)
    assert(got.map(_._3).toSeq == (1L to got.length.toLong))
    // rerunning gives the identical sample (the draw is a function of
    // doc_id, not of partitioning or time)
    val again = DsirOps.importanceResample(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    assert(again.toSeq == got.toSeq)
  }
}
