package graft.operators

import graft.Tables
import graft.functions.{IntKernels, StrHash, TextFns}
import graft.functions.Exact.lcount
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** D40: importance resampling for data selection — the DSIR recipe
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023, public method): score each incoming
  * crawl document by how much more likely its hashed-n-gram profile is
  * under the TARGET distribution (the standing corpus, doc_id % 10 ≠ 7
  * — the data you already trust) than under the RAW distribution (the
  * crawl itself, doc_id % 10 = 7), then sample the crawl
  * proportionally to those importance weights. Between the LM filter
  * (D38, absolute quality) and the mixture quotas (D21, hard
  * per-source caps), this is the third selection primitive a training
  * pipeline runs: soft distribution matching.
  *
  * Every number is integer Q10 fixed point, so results are
  * bit-reproducible on any engine (the D38 contract):
  *   - features: unigrams + adjacent bigrams hashed into [[Buckets]]
  *     slots via the house 64-bit string hash (StrHash = poly fold +
  *     splitmix64; bucket = pmod — [[Buckets]] divides 2⁶⁴, so the
  *     DuckDB oracle's unsigned mod is the same word);
  *   - per-bucket log-likelihood-ratio score with add-one smoothing:
  *     score(b) = [q(ct(b)+1) − q(Nt+B)] − [q(cr(b)+1) − q(Nr+B)]
  *     (q = the monotone integer log2, [[IntKernels.qlog2]]);
  *   - log importance weight of a doc = Σ_b c_doc(b)·score(b).
  *     Magnitude bound: |score| ≤ q(N+B) < 64·1024, so the per-doc sum
  *     stays below 2⁶³ until a single document holds ~1.4×10¹⁴ tokens
  *     — beyond any real document; ANSI mode faults rather than wraps.
  *
  * Sampling without transcendentals: Gumbel-max in base 2. With
  * u ~ Uniform(0,1] drawn deterministically per doc (splitmix64 of the
  * salted doc id, top 53 bits), g = −log2(−log2 u) is a Gumbel variate
  * scaled to base-2 logits, so argmax_i (log2 w_i + g_i) samples
  * i ∝ w_i exactly; the top-k of those keys is a Gumbel-top-k sample
  * without replacement (Vieira 2014, public). Both logs are the same
  * qlog2 kernel, so the oracle replicates the draw bit-for-bit —
  * "sampled" and "deterministic" stop being in tension.
  *
  * Scale shape: feature hashing is map-side codegen; per-(doc, bucket)
  * counts are one partial-agg shuffle; the two model tables are
  * ≤ [[Buckets]] rows (broadcast — the model is O(1) like the IVF
  * quantizer); the per-doc rollup is one doc_id-keyed partial-agg
  * shuffle; the resample is the bounded-heap global top-k. No stage
  * touches more than the crawl's own token stream.
  */
object DsirOps {
  /** Hashed feature space width (model tables are ≤ this many rows). */
  val Buckets = 256
  /** Resample size (Gumbel-top-k without replacement). */
  val SampleK = 25
  /** Salt for the per-doc uniform draw (house prime, cf. D37). */
  val Salt = 7919L

  private def docsToks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))

  /** Hashed unigram + adjacent-bigram feature stream: (doc_id, bucket),
    * one row per feature OCCURRENCE (counts, not presence — the DSIR
    * bag-of-hashed-ngrams estimator).
    */
  private def features(df: DataFrame): DataFrame = {
    val uni = df.select(col("doc_id"), explode(col("toks")).as("feat"))
    val bi = df.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2)))).as("feat"))
    uni.unionByName(bi)
      .select(col("doc_id"),
        pmod(StrHash.strhash64(col("feat")), lit(Buckets.toLong)).as("bucket"))
  }

  /** Target-side (standing corpus) bucket counts — half the fitted
    * model, ≤[[Buckets]] rows; the layout write side of the
    * `dsir_target` family.
    */
  private[graft] def targetCounts(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.df(spark, s"dsirTc:$dir") {
      features(docsToks(spark, dir).filter(col("doc_id") % 10 =!= 7))
        .groupBy("bucket").agg(lcount.as("ct"))
    }

  /** Raw-side (crawl) bucket counts — the other half (`dsir_raw`). */
  private[graft] def rawCounts(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.df(spark, s"dsirRc:$dir") {
      features(docsToks(spark, dir).filter(col("doc_id") % 10 === 7))
        .groupBy("bucket").agg(lcount.as("cr"))
    }

  /** The fitted model from explicit count frames (session memos or
    * reloaded layout tables — same code either way): per-bucket Q10
    * log-likelihood-ratio scores, add-one smoothed. Raw-side buckets
    * only — a crawl doc can only hit buckets the raw fit saw.
    */
  private def bucketScoresFrom(tc: DataFrame, rc: DataFrame): DataFrame = {
    import graft.functions.IntKernels.qlog2
    val nt = tc.agg(sum(col("ct")).cast(LongType).as("nt")).withColumn("one", lit(1))
    val nr = rc.agg(sum(col("cr")).cast(LongType).as("nr")).withColumn("one", lit(1))
    rc.join(tc, Seq("bucket"), "left")
      .withColumn("one", lit(1))
      .join(broadcast(nt), "one").join(broadcast(nr), "one")
      .select(col("bucket"),
        ((qlog2(coalesce(col("ct"), lit(0L)) + lit(1L))
          - qlog2(col("nt") + lit(Buckets.toLong)))
          - (qlog2(col("cr") + lit(1L))
            - qlog2(col("nr") + lit(Buckets.toLong)))).as("score_q10"))
  }

  /** Per-crawl-doc importance weights against explicit model tables,
    * unordered — shared by the session faces and the layout-served
    * twin (one code path, so the persisted route cannot drift).
    */
  private[graft] def weightsAgainst(spark: SparkSession, dir: String,
      tc: DataFrame, rc: DataFrame): DataFrame = {
    val perDoc = features(docsToks(spark, dir).filter(col("doc_id") % 10 === 7))
      .groupBy("doc_id", "bucket").agg(lcount.as("n"))
    perDoc.join(broadcast(bucketScoresFrom(tc, rc)), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("n")).cast(LongType).as("n_feats"),
        sum(col("n") * col("score_q10")).cast(LongType).as("logw_q10"))
  }

  /** Per-crawl-doc importance weights, unordered (shared by the two
    * query faces).
    */
  private[graft] def weightsFrame(spark: SparkSession, dir: String): DataFrame =
    weightsAgainst(spark, dir, targetCounts(spark, dir), rawCounts(spark, dir))

  /** The finished D40 output frame over explicit model tables — the
    * ONE output face both the session query and the layout-served twin
    * use, so the two cannot drift in column set, scale, or ordering.
    */
  private[graft] def weightsOutput(spark: SparkSession, dir: String,
      tc: DataFrame, rc: DataFrame): DataFrame =
    weightsAgainst(spark, dir, tc, rc)
      .withColumn("logw_bits", col("logw_q10").cast(DoubleType) / lit(1024.0))
      .orderBy("doc_id")

  /** D40: doc_importance_weights — every crawl document's Q10 log
    * importance weight under the standing-corpus target.
    */
  def importanceWeights(spark: SparkSession, dir: String): DataFrame =
    weightsOutput(spark, dir, targetCounts(spark, dir), rawCounts(spark, dir))

  /** Driver-side scorer against collected model maps — the streaming
    * face's kernel (E23): same hash, same qlog2, same smoothing as the
    * distributed path, so streamed weights equal batch weights
    * bit-for-bit (parity spec).
    */
  private[graft] def driverScore(text: String,
      t: Map[Long, Long], r: Map[Long, Long],
      nt: Long, nr: Long): (Long, Long) = {
    import graft.functions.{IntMath, StrHash}
    val toks = text.split(" ", -1)
    var n = 0L
    var w = 0L
    def add(feat: String): Unit = {
      val h = StrHash.hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(feat)) % Buckets
      val b = if (h < 0) h + Buckets else h
      w += (IntMath.qlog2(t.getOrElse(b, 0L) + 1) -
          IntMath.qlog2(nt + Buckets)) -
        (IntMath.qlog2(r.getOrElse(b, 0L) + 1) -
          IntMath.qlog2(nr + Buckets))
      n += 1
    }
    toks.foreach(add)
    var i = 0
    while (i < toks.length - 1) { add(toks(i) + " " + toks(i + 1)); i += 1 }
    (n, w)
  }

  /** The deterministic base-2 Gumbel draw for a doc id: u from the
    * salted splitmix64's top 53 bits (u ∈ [1, 2⁵³] as an integer, i.e.
    * Uniform(0,1] at 53-bit resolution), then
    * g_q10 = −q(−log2 u) + 10·1024 (the +10240 rescales q's Q10 input
    * back: log2(L/1024) = log2 L − 10). The u = 2⁵³ atom (probability
    * 2⁻⁵³) clamps L to 1 instead of faulting qlog2(0).
    */
  private[graft] def gumbelQ10(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.IntKernels.{mix64, qlog2}
    val u = shiftrightunsigned(mix64(id + lit(Salt)), 11) + lit(1L)
    val l = lit(53L * 1024) - qlog2(u)
    lit(10240L) - qlog2(greatest(l, lit(1L)))
  }

  /** D40b: doc_importance_resample — Gumbel-top-k over the importance
    * weights: the k crawl documents a DSIR selection run keeps, with
    * the full audit trail (weight, draw, key, rank).
    */
  def importanceResample(spark: SparkSession, dir: String,
      k: Int = SampleK): DataFrame = {
    val keyed = weightsFrame(spark, dir)
      .withColumn("gumbel_q10", gumbelQ10(col("doc_id")))
      .withColumn("key_q10",
        (col("logw_q10") + col("gumbel_q10")).cast(LongType))
    graft.plans.TopK.perKey(keyed, Seq(lit(1)),
        Seq(col("key_q10").desc, col("doc_id").asc), k)
      .select(col("doc_id"), col("n_feats"), col("logw_q10"),
        col("gumbel_q10"), col("key_q10"), col("rnk"))
      .orderBy("rnk")
  }
}
