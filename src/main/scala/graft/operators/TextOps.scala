package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** D5–D8: text analysis over `documents` — token counting, quality
  * scoring, language ID, winnowing fingerprints. Per-row expressions
  * only: embarrassingly parallel, no shuffle except the final sort.
  */
object TextOps {

  /** D5: token counting — whitespace tokens + BPE-ish regex pieces. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast(LongType).as("n_ws_tokens"),
        TextFns.regexTokenCount(col("text")).as("n_re_tokens"),
        length(col("text")).cast(LongType).as("n_chars_calc"))
      .orderBy("doc_id")

  private[operators] val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** D6: quality scoring — length/punct/digit/stopword signals folded
    * into a single deterministic score.
    */
  def quality(spark: SparkSession, dir: String): DataFrame =
    qualityScored(spark, dir)
      .select("doc_id", "n_tok", "stop_cnt", "punct_cnt", "digit_cnt",
        "stop_ratio", "punct_ratio", "avg_word_len", "score")
      .orderBy("doc_id")

  /** The D6 signals without the presentation sort — consumers that
    * keep processing (D16 curation, D23 keep-best) compose this so no
    * corpus-wide ordering sneaks into the middle of a pipeline.
    */
  private[operators] def qualityScored(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    Tables.documents(spark, dir)
      .withColumn("n_tok", size(toks).cast(LongType))
      .withColumn("stop_cnt", TextFns.stopwordCount(toks, Stopwords))
      .withColumn("punct_cnt", TextFns.punctCount(col("text")))
      .withColumn("digit_cnt", TextFns.digitCount(col("text")))
      .withColumn("tok_chars", TextFns.tokenChars(toks))
      .withColumn("stop_ratio",
        col("stop_cnt").cast(DoubleType) / col("n_tok").cast(DoubleType))
      .withColumn("punct_ratio",
        col("punct_cnt").cast(DoubleType) / col("n_chars").cast(DoubleType))
      .withColumn("avg_word_len",
        col("tok_chars").cast(DoubleType) / col("n_tok").cast(DoubleType))
      .withColumn("score",
        lit(0.5) * col("stop_ratio") + lit(0.3) * (lit(1.0) - col("punct_ratio")) +
        lit(0.2) * when(col("n_chars").between(100, 2000), 1.0).otherwise(0.0))
  }

  /** D24: per-language corpus length profile — the distribution a
    * packing/truncation policy is tuned against: doc count plus exact
    * p10/p50/p90 of characters and whitespace tokens per language.
    * Exact interpolated percentile for oracle parity;
    * [[lengthStatsApprox]] is the sketch-based 100 TB drop-in with the
    * same grouping shape, tolerance-pinned against this operator.
    */
  def lengthStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tok", size(TextFns.tokens(col("text"))).cast(LongType))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).cast(LongType).as("n_docs"),
        expr("percentile(n_chars, 0.1)").as("chars_p10"),
        expr("percentile(n_chars, 0.5)").as("chars_p50"),
        expr("percentile(n_chars, 0.9)").as("chars_p90"),
        expr("percentile(n_tok, 0.1)").as("tok_p10"),
        expr("percentile(n_tok, 0.5)").as("tok_p50"),
        expr("percentile(n_tok, 0.9)").as("tok_p90"))
      .orderBy("lang")

  /** D24 at 100 TB: the approx_percentile drop-in the exact operator's
    * doc promises — IDENTICAL grouping shape, t-digest sketch
    * aggregation instead of the exact sort, so per-group state is
    * O(1/accuracy) regardless of group size and the partial aggregate
    * is mergeable (one pass, no per-group sort buffer). Bounded rank
    * error ⇒ asserted against [[lengthStats]] within tolerance in
    * TextAnalysisSpec (no DuckDB oracle by design: sketch internals
    * are implementation-defined; the exact twin IS the contract).
    */
  def lengthStatsApprox(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tok", size(TextFns.tokens(col("text"))).cast(LongType))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).cast(LongType).as("n_docs"),
        expr(s"approx_percentile(n_chars, 0.1, $accuracy)").cast(DoubleType).as("chars_p10"),
        expr(s"approx_percentile(n_chars, 0.5, $accuracy)").cast(DoubleType).as("chars_p50"),
        expr(s"approx_percentile(n_chars, 0.9, $accuracy)").cast(DoubleType).as("chars_p90"),
        expr(s"approx_percentile(n_tok, 0.1, $accuracy)").cast(DoubleType).as("tok_p10"),
        expr(s"approx_percentile(n_tok, 0.5, $accuracy)").cast(DoubleType).as("tok_p50"),
        expr(s"approx_percentile(n_tok, 0.9, $accuracy)").cast(DoubleType).as("tok_p90"))
      .orderBy("lang")

  /** D29: per-language vocabulary profile — the tokenizer-induction
    * input: top-k tokens by frequency per language with each token's
    * share of the language's token mass. Scale shape: one partial-agg
    * shuffle keyed by (lang, token) — high-cardinality, skew-free —
    * then the bounded-heap TopKPerKey (shuffle O(k·|langs|), never the
    * vocabulary), with the |langs|-row totals broadcast back for the
    * share. A BPE trainer's first pass is exactly this query with a
    * pair-expanded token column.
    */
  def vocabTopK(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(TextFns.tokens(col("text"))).as("tok"))
    val counts = toks.groupBy("lang", "tok")
      .agg(graft.functions.Exact.lcount.as("cnt"))
    val totals = toks.groupBy("lang")
      .agg(graft.functions.Exact.lcount.as("lang_tokens"))
    graft.plans.TopK.perKey(counts, Seq(col("lang")),
        Seq(col("cnt").desc, col("tok").asc), k)
      .join(broadcast(totals), "lang")
      .select(col("lang"), col("tok"), col("cnt"), col("rnk"),
        (col("cnt").cast(DoubleType) / col("lang_tokens").cast(DoubleType))
          .as("tok_frac"))
      .orderBy("lang", "rnk")
  }

  /** D29b: the Misra–Gries twin of [[vocabTopK]] — the per-language
    * vocabulary head from ONE pass with `capacity` counters per
    * partial aggregate (G11 kernel), where the exact query shuffles
    * every distinct (lang, token) pair. At 100 TB the exact head is a
    * full-vocabulary shuffle; this is a constant-size mergeable state
    * per task — the standard trade a profiling pass makes. Guarantees
    * (partitioning-independent, spec-pinned): estimates never exceed
    * the true count, undercount ≤ N_lang/(capacity+1), and every
    * token above that threshold is present. Like the B18b HLL twin,
    * the sketch is spec-bounded; [[vocabTopK]] is the oracled face.
    */
  def vocabSketch(spark: SparkSession, dir: String, capacity: Int = 64,
      k: Int = 25): DataFrame = {
    val sk = Tables.documents(spark, dir)
      .select(col("lang"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy("lang")
      .agg(graft.functions.FreqSketch.mgSketch(col("tok"), capacity).as("sk"))
    sk.select(col("lang"), posexplode(slice(col("sk"), 1, k)))
      .select(col("lang"), col("col.key").as("tok"),
        col("col.cnt").as("est_cnt"), (col("pos") + 1).cast(LongType).as("rnk"))
      .orderBy("lang", "rnk")
  }

  /** D31: per-doc top-k TF-IDF keywords — the tagging/indexing signal
    * a curation UI or topic router ranks documents by. The idf is kept
    * RATIONAL: score = (tf · N) / df, integer numerator and
    * denominator with ONE exactly-rounded double division, so values
    * and ordering are bit-reproducible on any engine (log-idf is not:
    * libm log differs across platforms in ULPs, and a float SUM of
    * logs is order-dependent). Scale shape: one (doc, tok) partial-agg
    * shuffle; the df table is vocab-sized (≪ corpus) and joins on tok
    * after aggregation; N rides a broadcast single-row join; the
    * per-doc top-k is the bounded-heap TopKPerKey, never a global
    * window over all (doc, tok) pairs.
    */
  def docKeywords(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val tf = t.groupBy("doc_id", "tok").agg(graft.functions.Exact.lcount.as("tf"))
    // df rides tf's shuffle output (one row per (doc, tok) already) —
    // never a second corpus-wide explode+distinct
    val dfTok = tf.groupBy("tok").agg(graft.functions.Exact.lcount.as("df"))
    val nDocs = Tables.documents(spark, dir)
      .agg(graft.functions.Exact.lcount.as("n_docs")).withColumn("one", lit(1))
    val scored = tf.join(dfTok, "tok")
      .withColumn("one", lit(1)).join(broadcast(nDocs), "one")
      .withColumn("score",
        graft.functions.ScoreFns.tfidf(col("tf"), col("df"), col("n_docs")))
    graft.plans.TopK.perKey(scored, Seq(col("doc_id")),
        Seq(col("score").desc, col("tok").asc), k)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        col("score"), col("rnk"))
      .orderBy("doc_id", "rnk")
  }

  /** D32: per-language top-k bigram collocations — the association
    * signal for multi-word-expression mining and tokenizer merges.
    * PMI is kept RATIONAL for the same bit-reproducibility reason as
    * D31: assoc = (c_ab · N) / (c_a · c_b), all-integer cross products
    * and one double division. Scale shape: bigram and unigram counts
    * are each one partial-agg shuffle; the two unigram joins key on
    * (lang, tok) — vocab-sized sides, never the corpus; per-lang
    * top-k via bounded heaps.
    */
  def collocations(spark: SparkSession, dir: String, k: Int = 20,
      minCount: Int = 3): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("lang"), TextFns.tokens(col("text")).as("toks"))
    val uni = d.select(col("lang"), explode(col("toks")).as("tok"))
    val ca = uni.groupBy("lang", "tok").agg(graft.functions.Exact.lcount.as("c"))
    // lang totals roll up from the unigram counts (exact long sum) —
    // no second pass over the exploded corpus
    val totals = ca.groupBy("lang").agg(sum(col("c")).cast(LongType).as("n_tokens"))
    val bg = d.filter(size(col("toks")) >= 2)
      .select(col("lang"), explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(element_at(col("toks"), i + 1).as("tok1"),
          element_at(col("toks"), i + 2).as("tok2")))).as("g"))
      .select(col("lang"), col("g.tok1"), col("g.tok2"))
    val cab = bg.groupBy("lang", "tok1", "tok2")
      .agg(graft.functions.Exact.lcount.as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val scored = cab
      .join(ca.withColumnRenamed("tok", "tok1").withColumnRenamed("c", "c_a"),
        Seq("lang", "tok1"))
      .join(ca.withColumnRenamed("tok", "tok2").withColumnRenamed("c", "c_b"),
        Seq("lang", "tok2"))
      .join(broadcast(totals), "lang")
      .withColumn("assoc", graft.functions.ScoreFns.pmi(
        col("c_ab"), col("c_a"), col("c_b"), col("n_tokens")))
    graft.plans.TopK.perKey(scored, Seq(col("lang")),
        Seq(col("assoc").desc, col("tok1").asc, col("tok2").asc), k)
      .select(col("lang"), col("tok1"), col("tok2"), col("c_ab"),
        col("c_a"), col("c_b"), col("assoc"), col("rnk"))
      .orderBy("lang", "rnk")
  }

  /** D38: bigram-LM cross-entropy scoring — the CCNet-style quality
    * filter: every document is scored by how surprising its token
    * transitions are under a reference language model, and the
    * reference model here is the STANDING corpus (doc_id % 10 ≠ 7,
    * the house standing/delta split) — the production shape, where an
    * incoming crawl is scored against the LM of the corpus you
    * already trust, and genuinely novel deltas pay a measurable
    * backoff penalty.
    *
    * All arithmetic is integer Q10 fixed point ([[IntKernels.qlog2]]):
    * bits(a→b) = q(c(a)) − q(c(ab)) for a seen bigram, and
    * q(N) − q(c(b)) + 4·1024 (unigram backoff + 4-bit penalty, c(b)=1
    * for OOV) for an unseen one — so scores are bit-reproducible on
    * any engine; libm-log perplexity is not. Scale shape: unigram and
    * bigram count tables are each one partial-agg shuffle and both are
    * vocab-bounded (≪ corpus); the scoring join keys transitions on
    * the bigram — many-to-one onto the count table, hot bigrams are
    * probe-side skew AQE splits; per-doc rollup is one partial-agg
    * shuffle keyed by doc_id.
    */
  def lmScore(spark: SparkSession, dir: String): DataFrame =
    lmScoreAgainst(spark, dir, lmUnigramFrame(spark, dir),
      lmBigramFrame(spark, dir), deltaOnly = false)

  /** D38c's tier cutpoints (shared with the oracle builder so the
    * fraction literals are bit-identical on both engines).
    */
  val TierLo: Double = 1.0 / 3
  val TierHi: Double = 2.0 / 3

  /** D38c: CCNet-style perplexity tiers — per language, documents
    * split into head/middle/tail thirds by bigram-LM bits-per-
    * transition (D38's score), the classic quality bucketing a
    * pretraining mixture samples from. Cutoffs are the exact
    * interpolated per-lang percentiles (the evt_percentiles device,
    * DuckDB quantile_cont ≡ Spark percentile) — |langs| rows
    * broadcast back for an IN-ROW tier assign: no corpus sort
    * anywhere, unlike a window NTILE.
    */
  def lmTiers(spark: SparkSession, dir: String): DataFrame = {
    val scored = lmScore(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
    val cuts = scored.groupBy("lang").agg(
      expr(s"percentile(bits_per_trans, $TierLo)").as("c_head"),
      expr(s"percentile(bits_per_trans, $TierHi)").as("c_mid"))
    scored.join(broadcast(cuts), "lang")
      .withColumn("tier",
        tierCol(col("bits_per_trans"), col("c_head"), col("c_mid")))
      .select("doc_id", "lang", "n_trans", "bits_per_trans",
        "c_head", "c_mid", "tier")
      .orderBy("doc_id")
  }

  /** The tier CASE shared by D38c and the E35 stream face. */
  private[graft] def tierCol(bits: Column, cHead: Column, cMid: Column): Column =
    when(bits <= cHead, "head").when(bits <= cMid, "middle").otherwise("tail")

  /** Frozen per-lang tier cutoffs from the STANDING corpus's own
    * scores (docs outside the % 10 = 7 delta split) — the serving
    * artifact E35 tiers arrivals against; memoized like the LM count
    * tables it derives from.
    */
  private[graft] def lmStandingCuts(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.df(spark, s"lmStandingCuts:$dir") {
      lmScore(spark, dir)
        .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
        .filter(col("doc_id") % 10 =!= 7)
        .groupBy("lang").agg(
          expr(s"percentile(bits_per_trans, $TierLo)").as("c_head"),
          expr(s"percentile(bits_per_trans, $TierHi)").as("c_mid"))
    }

  /** Adjacent-pair explode of a (doc_id, toks) frame. */
  private def lmBigrams(df: DataFrame): DataFrame = df
    .select(col("doc_id"), explode(transform(
      sequence(lit(0), size(col("toks")) - 2),
      i => struct(element_at(col("toks"), i + 1).as("tok1"),
        element_at(col("toks"), i + 2).as("tok2")))).as("g"))
    .select(col("doc_id"), col("g.tok1"), col("g.tok2"))

  private def lmDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)

  /** Standing-corpus unigram counts — the reference LM's smaller half
    * (vocab-sized; its count sum IS the reference token total, so the
    * layout needs no separate N artifact).
    */
  private[graft] def lmUnigramFrame(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.df(spark, s"lmUnigrams:$dir") {
      lmDocs(spark, dir).filter(col("doc_id") % 10 =!= 7)
        .select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(graft.functions.Exact.lcount.as("c_tok"))
    }

  /** Standing-corpus bigram counts — the reference LM's transition
    * table (distinct-bigram-sized ≪ corpus).
    */
  private[graft] def lmBigramFrame(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.df(spark, s"lmBigrams:$dir") {
      lmBigrams(lmDocs(spark, dir).filter(col("doc_id") % 10 =!= 7))
        .groupBy("tok1", "tok2").agg(graft.functions.Exact.lcount.as("c_ab"))
    }

  /** Score documents against the given LM count tables (session
    * frames or reloaded layout tables — same code either way, so the
    * persisted path cannot drift). `deltaOnly` scores just the crawl
    * split (doc_id % 10 = 7) — the production probe shape.
    */
  private[graft] def lmScoreAgainst(spark: SparkSession, dir: String,
      cu: DataFrame, cb: DataFrame, deltaOnly: Boolean): DataFrame = {
    import graft.functions.IntKernels.qlog2
    import graft.functions.Exact.lcount
    val scored = if (deltaOnly) lmDocs(spark, dir).filter(col("doc_id") % 10 === 7)
      else lmDocs(spark, dir)
    // N = sum of unigram counts (exact long; == the reference token
    // count), broadcast as a 1-row frame
    val nRef = cu.agg(sum(col("c_tok")).cast(LongType).as("n_toks"))
      .withColumn("one", lit(1))
    val bits = when(col("c_ab").isNotNull,
        qlog2(col("c_a")) - qlog2(col("c_ab")))
      .otherwise(qlog2(col("n_toks")) - qlog2(coalesce(col("c_b"), lit(1L)))
        + lit(4096L))
    lmBigrams(scored)
      .join(cb, Seq("tok1", "tok2"), "left")
      .join(cu.withColumnRenamed("tok", "tok1")
        .withColumnRenamed("c_tok", "c_a"), Seq("tok1"), "left")
      .join(cu.withColumnRenamed("tok", "tok2")
        .withColumnRenamed("c_tok", "c_b"), Seq("tok2"), "left")
      .withColumn("one", lit(1)).join(broadcast(nRef), "one")
      .groupBy(col("doc_id"))
      .agg(lcount.as("n_trans"), sum(bits).cast(LongType).as("xent_q10"))
      .withColumn("bits_per_trans", col("xent_q10").cast(DoubleType)
        / (lit(1024.0) * col("n_trans").cast(DoubleType)))
      .orderBy("doc_id")
  }

  /** D35: inverted-index build — the posting-list layout BM25 (D34)
    * consumes at scale: per term, df, total tf, and the doc-sorted
    * posting list "doc:tf …". The groupBy(term) exchange IS the index
    * build: each term's postings land co-located (in production the
    * aggregate writes term-bucketed parquet instead of a string; the
    * string form here keeps the layout oracle-checkable). Demo output
    * capped to the top-k terms by df via the global bounded heap.
    */
  def invertedPostings(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    postingsTopK(postingsFrame(spark, dir), k)

  /** The FULL postings layout (every term) — the write side of the
    * persisted index (LayoutOps); [[invertedPostings]] is its demo
    * top-k face.
    */
  private[graft] def postingsFrame(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val tf = t.groupBy("doc_id", "tok").agg(graft.functions.Exact.lcount.as("tf"))
    tf.groupBy("tok").agg(
      graft.functions.Exact.lcount.as("df"),
      sum(col("tf")).cast(LongType).as("total_tf"),
      array_join(transform(
        sort_array(collect_list(struct(col("doc_id"), col("tf")))),
        p => concat_ws(":", p.getField("doc_id"), p.getField("tf"))), " ")
        .as("postings"))
  }

  /** The D35 output shape over any postings frame (session-built or
    * reloaded from the persisted table).
    */
  private[graft] def postingsTopK(inv: DataFrame, k: Int = 100): DataFrame =
    graft.plans.TopK.perKey(inv, Seq(lit(1)),
        Seq(col("df").desc, col("tok").asc), k)
      .select(col("tok"), col("df"), col("total_tf"), col("postings"), col("rnk"))
      .orderBy("rnk")

  // ── D70: incremental postings maintenance ──────────────────────

  /** Per-(doc, token) term frequencies of one side of the crawl
    * split (doc_id % 10 = 7 is the incoming delta — the convention
    * shared with D15/D28b/D36h).
    */
  private def tfRows(spark: SparkSession, dir: String,
      deltaSide: Boolean): DataFrame =
    tfOf(Tables.documents(spark, dir)
      .filter(if (deltaSide) col("doc_id") % 10 === 7
              else col("doc_id") % 10 =!= 7))

  /** (doc_id, tok, tf) rows of any document frame — shared by the
    * batch split and the E42 stream's per-micro-batch tokenization.
    */
  private[graft] def tfOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(graft.functions.Exact.lcount.as("tf"))

  /** Aggregate (doc,tok,tf) rows into per-token postings with the
    * list kept STRUCTURED (array of (doc_id, tf), sorted by doc_id)
    * so a later merge is array concatenation, not string parsing.
    */
  private def aggPosts(tf: DataFrame): DataFrame =
    tf.groupBy("tok").agg(
      graft.functions.Exact.lcount.as("df"),
      sum(col("tf")).cast(LongType).as("total_tf"),
      sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("posts"))

  /** The standing-corpus postings index (structured lists) — the
    * persisted base table (LayoutOps family `postings_base`,
    * bucketed on tok) a daily delta merges into.
    */
  private[graft] def postingsBaseFrame(spark: SparkSession,
      dir: String): DataFrame =
    aggPosts(tfRows(spark, dir, deltaSide = false))

  /** D70: incremental inverted-index maintenance — the index dual of
    * D28b's incremental corpus build. The standing index is the
    * persisted `postings_base` layout; the delta tokenizes and
    * aggregates ALONE (never re-reading a corpus document), then
    * merges per token: untouched tokens pass through as stored rows
    * (anti-join against the broadcast delta vocabulary — at 100 TB
    * the overwhelming majority of the index is never rewritten),
    * touched tokens splice the delta's sorted entries into the stored
    * list in-row (df/total_tf add exactly; doc ids are disjoint
    * across the split, so one re-sort restores postings order). The
    * merge join keys on tok, where the base side is bucketed — only
    * the delta-sized aggregate crosses the wire. Oracle = the FULL
    * rebuild's SQL (text_inverted_postings over all documents): hash
    * parity proves the merge algebra lossless.
    */
  def postingsIncremental(spark: SparkSession, dir: String): DataFrame =
    postingsMerged(spark, dir, tfRows(spark, dir, deltaSide = true))

  /** The merge over ANY delta (doc_id, tok, tf) frame — the batch
    * split (D70) and the stream-maintained delta table (E42) serve
    * through this one code path.
    */
  private[graft] def postingsMerged(spark: SparkSession, dir: String,
      deltaTf: DataFrame): DataFrame = {
    val base = LayoutOps.table(spark, dir, "postings_base")
    val delta = aggPosts(deltaTf)
      .select(col("tok"), col("df").as("df_d"),
        col("total_tf").as("tf_d"), col("posts").as("posts_d"))
    // delta vocabulary ≤ delta token volume: broadcastable for any
    // daily batch (a crawl delta's distinct tokens, not the corpus's)
    val untouched = base
      .join(broadcast(delta.select("tok")), Seq("tok"), "left_anti")
    val emptyPosts = array().cast("array<struct<doc_id:bigint,tf:bigint>>")
    val touched = base.join(delta, Seq("tok"), "right_outer")
      .select(col("tok"),
        (coalesce(col("df"), lit(0L)) + col("df_d")).as("df"),
        (coalesce(col("total_tf"), lit(0L)) + col("tf_d")).as("total_tf"),
        sort_array(concat(coalesce(col("posts"), emptyPosts),
          col("posts_d"))).as("posts"))
    val merged = untouched.unionByName(touched)
      .select(col("tok"), col("df"), col("total_tf"),
        array_join(transform(col("posts"),
          p => concat_ws(":", p.getField("doc_id"), p.getField("tf"))),
          " ").as("postings"))
    postingsTopK(merged)
  }

  /** E42's serving face: the merged index from the stream-maintained
    * delta table alone — no batch split, no session memo; a restarted
    * session serves current postings from the two tables.
    */
  def postingsServedWithDelta(spark: SparkSession, dir: String): DataFrame =
    postingsMerged(spark, dir, LayoutOps.table(spark, dir, "postings_delta"))

  /** D34's demo query terms (common corpus tokens). */
  val Bm25Terms: Seq[String] = Seq("scan", "window", "merge")

  /** D34: BM25 full-text search over the corpus — the retrieval scorer
    * a curation/inspection UI runs. RATIONAL idf (the D31 contract):
    * idf = (N − df + ½)/(df + ½) with no libm log, every op exactly
    * rounded, so scores and ranking are bit-reproducible. Scale shape:
    * the explode is pre-filtered to the query terms (predicate under
    * the generate, the corpus scan emits |terms|·|docs| rows max), df
    * and length stats are single-row/|terms|-row broadcasts, the final
    * global top-k runs on bounded per-partition heaps — no corpus
    * sort, no unfiltered shuffle.
    */
  def docSearchBm25(spark: SparkSession, dir: String,
      terms: Seq[String] = Bm25Terms, k: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast(LongType).as("n_tok"))
    val t = docs
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val tf = t.groupBy("doc_id", "tok").agg(graft.functions.Exact.lcount.as("cnt"))
    val tfw = tf.groupBy("doc_id").agg(
      coalesce(max(when(col("tok") === terms.head, col("cnt"))), lit(0L)).as("tf0"),
      terms.zipWithIndex.tail.map { case (tm, i) =>
        coalesce(max(when(col("tok") === tm, col("cnt"))), lit(0L)).as(s"tf$i")
      }: _*)
    val dfw = tf.groupBy("tok").agg(graft.functions.Exact.lcount.as("df"))
      .agg(
        coalesce(max(when(col("tok") === terms.head, col("df"))), lit(0L)).as("df0"),
        terms.zipWithIndex.tail.map { case (tm, i) =>
          coalesce(max(when(col("tok") === tm, col("df"))), lit(0L)).as(s"df$i")
        }: _*)
    val stats = docs.agg(graft.functions.Exact.lcount.as("n_docs"),
        sum(col("n_tok")).cast(LongType).as("total"))
      .select(col("n_docs"), (col("total").cast(DoubleType) /
        col("n_docs").cast(DoubleType)).as("avgdl"))
    val scored = docs.select("doc_id", "n_tok")
      .join(tfw, Seq("doc_id"), "left")
      .na.fill(0L, terms.indices.map(i => s"tf$i"))
      .withColumn("one", lit(1))
      .join(broadcast(dfw.withColumn("one", lit(1))), "one")
      .join(broadcast(stats.withColumn("one", lit(1))), "one")
    def w(i: Int): Column = {
      val tfd = col(s"tf$i").cast(DoubleType)
      val idf = graft.functions.ScoreFns.bm25Idf(col("n_docs"), col(s"df$i"))
      idf * (tfd * lit(2.2)) / (tfd + lit(1.2) *
        (lit(1.0) - lit(0.75) +
          lit(0.75) * col("n_tok").cast(DoubleType) / col("avgdl")))
    }
    val withScore = scored.withColumn("score",
        terms.indices.map(w).reduceLeft(_ + _))
      .filter(col("score") > 0.0)
    graft.plans.TopK.perKey(withScore, Seq(lit(1)),
        Seq(col("score").desc, col("doc_id").asc), k)
      .select(col("doc_id"), col("n_tok"), col("score"), col("rnk"))
      .orderBy("rnk")
  }

  /** D50's knobs, shared with the oracle builder: shingles with
    * 2 ≤ df ≤ cap carry signal (df=1 shingles pair with nothing;
    * ubiquitous shingles are boilerplate AND the self-join's skew
    * risk — the same stop-shingle guard as D2b), k neighbors per doc,
    * W the idf weight scale.
    */
  val SimilarDfCap = 50L
  val SimilarW = 1000L
  val SimilarK = 5

  /** D50: sparse "more-like-this" — top-k most similar documents per
    * document through the shingle postings, the SPARSE counterpart of
    * dense ANN (D9): score(a,b) = Σ over shared distinct 3-gram
    * shingles of an integer idf weight ⌊W·N/df⌋, so rare shared
    * phrasing dominates. The weight is exact integer floor-division
    * and the pair score accumulates in DECIMAL(38,0) — order-
    * independent and overflow-safe at any corpus scale (the PmiScore
    * lesson), DuckDB-replicable via HUGEINT.
    *
    * Scale shape: candidates come from the df-capped postings
    * self-join (per-shingle cost ≤ cap², never O(n²)); per-pair
    * aggregation is map-side combinable; ranking is the bounded-heap
    * TopKPerKey — no corpus sort anywhere.
    */
  def docSimilar(spark: SparkSession, dir: String, k: Int = SimilarK): DataFrame = {
    val p = similarPostingsFrame(spark, dir)
    docSimilarOn(p, p.select("doc_id", "lang", "shingle"), k)
  }

  /** The df-capped WEIGHTED shingle postings (lang, shingle, doc_id,
    * w) — D50's candidate layout, session-memoized here and persisted
    * shingle-bucketed by the D36j family.
    */
  private[graft] def similarPostingsFrame(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.df(spark, s"similarPostings:$dir") {
      // derive df AND join it back on the (lang, shingle)-CLUSTERED
      // session artifact (the ngramPairs device): groupBy and join
      // both plan exchange-free against the cached clustering, so the
      // corpus-sized exploded table never reshuffles — at ANY corpus
      // size. The first cut read the unclustered explosion and left
      // the weight-table join to the planner: fine while wtab
      // broadcast, but past the broadcast threshold (any real corpus)
      // it silently flipped to a full corpus shuffle — the r11
      // ScaleAudit's doc_similar finding (16.9 → 294 MB at ×10).
      val ex = DedupOps.shinglesByKey(spark, dir)
        .select("doc_id", "lang", "shingle")
      val stats = Tables.documents(spark, dir)
        .agg(graft.functions.Exact.lcount.as("n_docs"))
      val wtab = ex.groupBy("lang", "shingle")
        .agg(graft.functions.Exact.lcount.as("df"))
        .filter(col("df").between(lit(2L), lit(SimilarDfCap)))
        .crossJoin(broadcast(stats))
        .withColumn("w", expr(s"($SimilarW * n_docs) div df"))
        .select("lang", "shingle", "w")
      val posts = ex.join(wtab, Seq("lang", "shingle"))
      // each row also carries ITS DOC's capped-set size (n_sh): the
      // jaccard denominators the D54 fusion needs then ride the pair
      // stream in-row instead of via two per-doc joins — which the
      // planner broadcasts at toy scale but flips to pair-stream
      // re-shuffles past the threshold (the r11 ScaleAudit's
      // doc_similar_rrf ×32 finding). The size derivation and the
      // re-clustering are two LINEAR exchanges paid once at build
      // (memoized, persisted by the D36j family)
      val sizes = posts.groupBy("doc_id")
        .agg(graft.functions.Exact.lcount.as("n_sh"))
      posts.join(sizes, "doc_id")
        .repartition(col("lang"), col("shingle"))
    }

  /** [[docSimilar]] over any postings source (session-built or
    * persisted) and any probe frame (doc_id, lang, shingle) — the
    * serving face. Probe shingles need no df pre-filter: joining the
    * capped postings applies it.
    */
  private[graft] def docSimilarOn(postings: DataFrame, probes: DataFrame,
      k: Int = SimilarK): DataFrame = {
    val pairs = probes.select(col("lang"), col("shingle"),
        col("doc_id").as("a_id"))
      .join(postings.select(col("lang"), col("shingle"),
        col("doc_id").as("b_id"), col("w")), Seq("lang", "shingle"))
      .filter(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(graft.functions.Exact.lcount.as("n_shared"),
        sum(col("w").cast(DecimalType(38, 0))).as("score"))
    graft.plans.TopK.perKey(pairs, Seq(col("a_id")),
        Seq(col("score").desc, col("b_id").asc), k)
      // Rank on the exact decimal; EMIT double — decimal128 in the
      // output parquet hashes differently from the oracle's DuckDB
      // float path (the one emission-type rule every query follows).
      .select(col("a_id"), col("b_id"), col("n_shared"),
        col("score").cast("double").as("score"), col("rnk"))
      .orderBy("a_id", "rnk")
  }

  /** D54's knobs: the standard RRF constant, the per-system list
    * depth fed into the fusion, and the fused top-k emitted.
    */
  val RrfC = 60L
  val RrfDepth = 20
  val RrfTopK = 10

  /** D54 kernel: reciprocal rank fusion of per-key rankings — the
    * standard ensemble device for combining retrieval systems whose
    * scores are not comparable (Cormack et al.'s RRF): each system
    * contributes 1/(C + rank) for items in its top-`depth`, items
    * missing from a system contribute 0. Inputs are (key, item, rnk)
    * frames; rank 0 is the documented "absent" sentinel in the output
    * (never null — a nullable int would leave hash-unstable NaN/None
    * renderings in the gate's two read paths).
    *
    * Scale shape: each input is already a bounded per-key top-k
    * (O(keys·depth) rows), the fusion join keys on (key, item), and
    * the final rank is the bounded heap — nothing here scales with
    * the corpus, only with the shortlists.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = RrfTopK): DataFrame = {
    def contrib(r: Column): Column =
      when(r > 0, lit(1.0) / (lit(RrfC) + r).cast(DoubleType))
        .otherwise(lit(0.0))
    val fused = a.join(b, Seq("key", "item"), "full_outer")
      .select(col("key"), col("item"),
        coalesce(col("rnk_a"), lit(0L)).as("r_a"),
        coalesce(col("rnk_b"), lit(0L)).as("r_b"))
      .withColumn("rrf", contrib(col("r_a")) + contrib(col("r_b")))
    graft.plans.TopK.perKey(fused, Seq(col("key")),
      Seq(col("rrf").desc, col("item").asc), k)
  }

  /** D54: ensemble more-like-this — the D50 idf-weighted ranking
    * fused with a capped-shingle Jaccard ranking via RRF, per anchor
    * (the D36j anchor set). The two signals rank genuinely
    * differently (total rare-phrase mass vs set overlap normalized by
    * document size), and RRF promotes candidates both agree on
    * without needing their scores on one scale. Both rankings derive
    * from ONE candidate-pair frame off the df-capped postings, so
    * candidate generation cost is paid once.
    */
  def docSimilarRrf(spark: SparkSession, dir: String): DataFrame =
    docSimilarRrfOn(similarPostingsFrame(spark, dir))

  /** [[docSimilarRrf]] over any postings source (session-built or the
    * persisted shingle_postings table) — the serving face; per-doc
    * set sizes and both rankings derive from the postings alone.
    */
  private[graft] def docSimilarRrfOn(p: DataFrame): DataFrame = {
    // the jaccard denominators (per-doc capped-set sizes) ride the
    // postings rows in-row (n_sh, attached once at layout build), so
    // the pair stream is aggregated ONCE and never re-shuffled for a
    // size lookup — the scale shape a billion-doc corpus needs, where
    // a per-doc side is far past any broadcast threshold
    val pairs = p.filter(col("doc_id") % 20 === 3)
      .select(col("lang"), col("shingle"), col("doc_id").as("a_id"),
        col("n_sh").as("na_row"))
      .join(p.select(col("lang"), col("shingle"),
        col("doc_id").as("b_id"), col("w"), col("n_sh").as("nb_row")),
        Seq("lang", "shingle"))
      .filter(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(graft.functions.Exact.lcount.as("n_shared"),
        sum(col("w").cast(DecimalType(38, 0))).as("s_idf"),
        max(col("na_row")).as("n_a"), max(col("nb_row")).as("n_b"))
      .withColumn("jacc", col("n_shared").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("n_shared")).cast(DoubleType))
    def ranked(order: Column, out: String): DataFrame =
      graft.plans.TopK.perKey(pairs, Seq(col("a_id")),
          Seq(order, col("b_id").asc), RrfDepth)
        .select(col("a_id").as("key"), col("b_id").as("item"),
          col("rnk").as(out))
    rrfFuse(ranked(col("s_idf").desc, "rnk_a"),
        ranked(col("jacc").desc, "rnk_b"))
      .select(col("key").as("a_id"), col("item").as("b_id"),
        col("r_a").as("r_idf"), col("r_b").as("r_jac"),
        col("rrf"), col("rnk"))
      .orderBy("a_id", "rnk")
  }

  /** D26: per-source quality profile — the signal a mixture/curation
    * policy ranks sources by: doc count and min/median/max of the D6
    * quality score per source. Only order-independent aggregates
    * (count, min/max, sort-based exact percentile), so results are
    * stable at any parallelism and oracle-replicable; |sources| groups
    * after a partial agg, so the shuffle is tiny at any corpus size.
    */
  def sourceQuality(spark: SparkSession, dir: String): DataFrame =
    qualityScored(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        min(col("score")).as("min_score"),
        expr("percentile(score, 0.5)").as("median_score"),
        max(col("score")).as("max_score"))
      .orderBy("source")

  /** Per-language token profiles (drawn from the corpus vocabulary —
    * the heuristic's shape, not a linguistic claim).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("group", "window", "hash", "merge"),
    "en" -> Seq("the", "fast", "key", "order"),
    "es" -> Seq("sort", "table", "scan", "row"),
    "fr" -> Seq("join", "filter", "stream", "value"),
    "zh" -> Seq("data", "query", "batch", "line"))

  /** Argmax language prediction over per-profile hit-count columns
    * `c_<lang>` (alphabetical tie-break) — shared by D7 and curation.
    */
  private[operators] def withLangCounts(df: DataFrame, toks: Column): DataFrame =
    LangProfiles.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"c_$lang", TextFns.stopwordCount(toks, words))
    }

  private[operators] def predLangCol: Column = {
    val m = greatest(LangProfiles.map { case (l, _) => col(s"c_$l") }: _*)
    LangProfiles.reverse.foldLeft(lit("und")) {
      case (els, (l, _)) => when(col(s"c_$l") === m, lit(l)).otherwise(els)
    }
  }

  /** D7: language ID — stopword-profile hit counts, argmax with
    * alphabetical tie-break.
    */
  def langid(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    withLangCounts(Tables.documents(spark, dir), toks)
      .withColumn("pred_lang", predLangCol)
      .withColumn("is_match", col("pred_lang") === col("lang"))
      .select(col("doc_id") +: col("lang") +:
        LangProfiles.map { case (l, _) => col(s"c_$l") } :+
        col("pred_lang") :+ col("is_match"): _*)
      .orderBy("doc_id")
  }

  /** D5b: normalization — lowercase, strip punctuation, collapse
    * whitespace (the canonicalization step ahead of dedup/shingling).
    */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col("text")), "[.,;:!?]", ""),
          "\\s+", " ")).as("norm_text"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast(LongType))
      .orderBy("doc_id")

  /** D8: winnowing fingerprints (char 8-grams, window 4) — MOSS-style
    * robust document fingerprinting for overlap mining.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("fps", TextFns.winnowFingerprints(col("text"), 8, 4))
      .select(col("doc_id"),
        size(col("fps")).cast(LongType).as("n_fp"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
      .orderBy("doc_id")

  /** D20: self-repetition signals — the Gopher/C4-style quality rule
    * family: fraction of duplicate word 2-grams and the most frequent
    * token's share. High values flag boilerplate/spam for the curation
    * pipeline. Per-row expressions only.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("n_grams", (size(col("toks")) - 1).cast(LongType))
      .withColumn("dup_2gram_frac",
        (col("n_grams") - size(array_distinct(transform(
          sequence(lit(0), size(col("toks")) - 2),
          i => concat_ws(" ", element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2))))).cast(LongType))
          .cast(DoubleType) / col("n_grams").cast(DoubleType))
    // top-token share via explode + two-level agg (linear and
    // distributed — a per-row distinct×contains scan is O(len²))
    val topTok = base.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).cast(LongType).as("top_tok_cnt"))
    base.join(topTok, "doc_id")
      .withColumn("top_tok_frac",
        col("top_tok_cnt").cast(DoubleType) / col("n_tok").cast(DoubleType))
      .select("doc_id", "n_tok", "n_grams", "dup_2gram_frac",
        "top_tok_cnt", "top_tok_frac")
      .orderBy("doc_id")
  }

  /** D49: Gopher-style per-document filter battery — the named rule
    * set (word-count bounds, mean-word-length bounds, alphabetic-word
    * share, minimum stopword hits, digit-character share) each emitted
    * as its own verdict column plus the conjunction `keep`. Every
    * threshold is evaluated by integer cross-multiplication (e.g.
    * mean word length in [3,10] ⇔ 3·n_tok ≤ tok_chars ≤ 10·n_tok), so
    * verdicts are engine-exact with no floating-point boundary — the
    * same device as the D42 quality gates. Per-row expressions only:
    * embarrassingly parallel, no shuffle before the presentation sort.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOn(Tables.documents(spark, dir))
      .orderBy("doc_id")

  /** The D49 battery over any (doc_id, text, n_chars) frame — shared
    * by the batch query and the E34 stream face (one definition, no
    * drift), unsorted so a streaming plan can consume it.
    */
  private[graft] def gopherRulesOn(docs: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    docs
      .withColumn("n_tok", size(toks).cast(LongType))
      .withColumn("tok_chars", TextFns.tokenChars(toks))
      .withColumn("alpha_cnt",
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast(LongType))
      .withColumn("stop_hits", TextFns.stopwordCount(toks, Stopwords))
      .withColumn("digit_cnt", TextFns.digitCount(col("text")))
      .withColumn("r_word_count", col("n_tok").between(5L, 1000L))
      .withColumn("r_mean_word_len",
        lit(3L) * col("n_tok") <= col("tok_chars") &&
          col("tok_chars") <= lit(10L) * col("n_tok"))
      .withColumn("r_alpha_share",
        lit(5L) * col("alpha_cnt") >= lit(4L) * col("n_tok"))
      .withColumn("r_stopwords", col("stop_hits") >= 2L)
      .withColumn("r_digit_share",
        lit(10L) * col("digit_cnt") <= col("n_chars").cast(LongType))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_alpha_share") && col("r_stopwords") && col("r_digit_share"))
      .select("doc_id", "n_tok", "tok_chars", "alpha_cnt", "stop_hits",
        "digit_cnt", "r_word_count", "r_mean_word_len", "r_alpha_share",
        "r_stopwords", "r_digit_share", "keep")
  }

  /** Email/phone patterns restricted to the regex subset Java and RE2
    * share (no lookaround), so the oracle replicates them verbatim.
    */
  private[operators] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[operators] val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** D18: PII scrub — email/phone redaction, the pre-training privacy
    * pass. The synthetic corpus carries no PII, so every third doc
    * gets a deterministic contact line appended first (same pattern as
    * the multimodal stub decode) and the scrubber is verified to
    * remove exactly it: per-type counts plus an md5 of the scrubbed
    * text pin the behavior bit-for-bit against the oracle. Per-row
    * expressions only — embarrassingly parallel at any scale.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val withPii = Tables.documents(spark, dir).withColumn("pii_text",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text")))
    withPii.select(col("doc_id"),
        size(regexp_extract_all(col("pii_text"), lit(EmailRe), lit(0)))
          .cast(LongType).as("n_emails"),
        size(regexp_extract_all(col("pii_text"), lit(PhoneRe), lit(0)))
          .cast(LongType).as("n_phones"),
        md5(regexp_replace(regexp_replace(col("pii_text"), EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]")).as("scrub_md5"))
      .orderBy("doc_id")
  }

  /** The phrase D35b searches — shared with the oracle generator so
    * query and oracle cannot drift (the Bm25Terms device).
    */
  val PhraseTerms: Seq[String] = Seq("table", "hash")

  /** D46's edit-distance ceiling (shared with the oracle builder). */
  val TypoMaxDist = 2

  /** D46: vocabulary typo pairs — distinct token pairs within edit
    * distance ≤ 2 (the OCR/typo normalization input of text
    * curation). Candidate generation is SymSpell-style (Garbe,
    * public): every token emits its ≤2-deletion neighborhood (O(L²)
    * short strings), and any two tokens within distance 2 MUST share
    * a variant — so the join keys on the high-cardinality variant
    * string, never on a length bucket whose vocabulary slice is
    * effectively all-pairs. The exact `levenshtein` verify runs only
    * on bucket cohabitants. The oracle states the NAIVE banded
    * self-join; hash parity proves the neighborhood rewrite loses no
    * pair.
    */
  def typoPairs(spark: SparkSession, dir: String): DataFrame = {
    // memoized: the O(|vocab|·L²) neighborhood expansion feeds BOTH
    // sides of the self-join — uncached it would be computed twice
    val keyed = graft.Memo.df(spark, s"typoKeys:$dir") {
      Tables.documents(spark, dir)
        .select(explode(TextFns.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0).distinct()
        .withColumn("d1", expr(
          "array_distinct(transform(sequence(1, length(tok)), " +
            "i -> concat(substring(tok, 1, i - 1), " +
            "substring(tok, i + 1, length(tok)))))"))
        .withColumn("d2", expr(
          "array_distinct(flatten(transform(d1, v -> " +
            "transform(sequence(1, length(v)), j -> " +
            "concat(substring(v, 1, j - 1), substring(v, j + 1, length(v)))))))"))
        .select(col("tok"),
          explode(array_distinct(concat(array(col("tok")), col("d1"),
            col("d2")))).as("k"))
    }
    val a = keyed.select(col("k"), col("tok").as("tok_a"))
    val b = keyed.select(col("k").as("k2"), col("tok").as("tok_b"))
    a.join(b, col("k") === col("k2") && col("tok_a") < col("tok_b"))
      .select("tok_a", "tok_b").distinct()
      .withColumn("dist",
        levenshtein(col("tok_a"), col("tok_b")).cast(LongType))
      .filter(col("dist") <= TypoMaxDist)
      .orderBy("tok_a", "tok_b")
  }

  /** D35b: exact phrase search over POSITIONAL postings — the
    * retrieval capability doc-level postings (D35) cannot answer.
    * The position table is filtered to the phrase's terms BEFORE any
    * join (at 100 TB that filter prunes the explode output to the
    * phrase terms' document frequency), then an (L−1)-way chain join
    * on (doc_id, pos + offset) counts occurrences. Every join keys on
    * doc_id — one clustering reused across the chain; at scale the
    * filtered slices would come bucket-pruned from a token-bucketed
    * positional layout (the D36c postings pattern with a pos column).
    */
  def phraseSearch(spark: SparkSession, dir: String,
      phrase: Seq[String] = PhraseTerms): DataFrame =
    phraseSearchOn(posPostingsFrame(spark, dir), phrase)

  /** Positional postings rows (tok, doc_id, pos) — the layout-time
    * derivation behind the persisted D36i table (token-bucketed, so
    * each phrase term's slice comes bucket-pruned).
    */
  private[graft] def posPostingsFrame(spark: SparkSession,
      dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "tok")))
      .select("tok", "doc_id", "pos")

  /** [[phraseSearch]] over any positional postings source — the
    * session explode or the persisted bucketed table (D36i).
    */
  def phraseSearchOn(pos: DataFrame,
      phrase: Seq[String] = PhraseTerms): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least 2 terms")
    val head = pos.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val matched = phrase.zipWithIndex.tail.foldLeft(head) {
      case (acc, (term, i)) =>
        val ti = pos.filter(col("tok") === term)
          .select(col("doc_id").as(s"d$i"), col("pos").as(s"p$i"))
        acc.join(ti, col("doc_id") === col(s"d$i") &&
            col(s"p$i") === col("p0") + i)
          .drop(s"d$i", s"p$i")
    }
    matched.groupBy(col("doc_id"))
      .agg(graft.functions.Exact.lcount.as("n_hits"))
      .orderBy("doc_id")
  }

  // ── D59: supervised Naive Bayes classifier ───────────────────────

  /** D59: multinomial Naive Bayes trained on the standing split
    * (doc_id % 10 ≠ 7, labels = lang), classifying the crawl split —
    * the fasttext-style supervised gate of a pretraining pipeline
    * (quality/domain/language filters are all this shape), scored in
    * engine-exact Q10 integer log-space (qlog2 kernel: no libm, no
    * double drift, order-independent sums):
    *
    *   score(d, s) = [qlog2 nd_s − qlog2 ndTot]                (prior)
    *     + Σ_t m_dt · (qlog2(c_st + 1) − qlog2(n_s + V))  (add-one
    *       smoothed likelihood over the train vocabulary V)
    *
    * Scale shape: the MODEL is vocab-bounded — |V|·|classes| weight
    * rows + |classes| constant rows — and broadcasts; the corpus
    * explodes to (doc, tok, m) rows, meets the model in one broadcast
    * hash join with a |classes|-row fanout, folds with ONE doc-keyed
    * partial agg, and takes the argmax on a k=1 bounded heap. No
    * corpus shuffle beyond the per-doc agg.
    *
    * Label honesty (r11): the model trains and evaluates against a
    * TEXT-DERIVED weak label — the D7 stopword-profile argmax
    * ([[weakLabeled]]) — NOT the generator's `lang` column, which is
    * independent of the text by construction (training against it put
    * held-out accuracy at the prior ceiling, the r10 honesty note).
    * With a label that is a genuine function of the tokens, a
    * correctly-learned NB must beat the class prior on the held-out
    * split, and the spec pins exactly that — on top of the oracled
    * exact-algebra contract (hash-parity with DuckDB) and the
    * independent in-memory score parity.
    */
  def classifyLang(spark: SparkSession, dir: String): DataFrame =
    classifyAgainst(spark, dir,
      nbCountsFrame(spark, dir), nbClassDocsFrame(spark, dir))

  /** The documents table with D59's weak label attached: the D7
    * stopword-profile argmax (`wl`), a deterministic pure function of
    * the text — shared by the trainer, the evaluator, the streaming
    * face's fixture, and (re-expressed in SQL) the DuckDB oracle.
    */
  private[graft] def weakLabeled(spark: SparkSession, dir: String): DataFrame =
    withLangCounts(Tables.documents(spark, dir), TextFns.tokens(col("text")))
      .withColumn("wl", predLangCol)
      .select(col("doc_id"), col("wl"), col("text"))

  /** The trained model's larger half: per-(class, token) counts —
    * vocab-bounded, the layout-family artifact. */
  private[graft] def nbCountsFrame(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.df(spark, s"nbCounts:$dir") {
      import graft.functions.Exact.lcount
      weakLabeled(spark, dir).filter(col("doc_id") % 10 =!= 7)
        .select(col("wl").as("cls"),
          explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy("cls", "tok").agg(lcount.as("c"))
    }

  /** The model's prior half: docs per class (|classes| rows — NOT
    * derivable from the token counts, so it persists separately). */
  private[graft] def nbClassDocsFrame(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.df(spark, s"nbClassDocs:$dir") {
      import graft.functions.Exact.lcount
      weakLabeled(spark, dir).filter(col("doc_id") % 10 =!= 7)
        .groupBy(col("wl").as("cls")).agg(lcount.as("nd"))
    }

  /** Classification against EXPLICIT model frames (session memos or
    * reloaded layout tables — same code either way). */
  private[graft] def classifyAgainst(spark: SparkSession, dir: String,
      classCounts: DataFrame, classDocs: DataFrame): DataFrame = {
    import graft.functions.IntKernels.qlog2
    import graft.functions.Exact.lcount
    val test = weakLabeled(spark, dir)
      .filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("wl").as("lang"),
        TextFns.tokens(col("text")).as("toks"))
    val nS = classCounts.groupBy("cls")
      .agg(sum(col("c")).cast(LongType).as("n_s"))
    val vocab = classCounts.agg(countDistinct(col("tok")).as("v"))
    val nd = classDocs
    val ndTot = classDocs.agg(sum(col("nd")).cast(LongType).as("nd_tot"))
    // |classes| rows: prior base + smoothing penalty per class
    val classes = nd.join(broadcast(ndTot)).join(nS, "cls")
      .join(broadcast(vocab))
      .select(col("cls"),
        (qlog2(col("nd")) - qlog2(col("nd_tot"))).as("base_q10"),
        qlog2(col("n_s") + col("v")).as("pen_q10"))
    val weights = classCounts
      .select(col("cls"), col("tok"), qlog2(col("c") + 1).as("lc_q10"))
    val m = test.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "lang", "tok").agg(lcount.as("m"))
    val scores = m.join(broadcast(classes))
      .join(broadcast(weights), Seq("cls", "tok"), "left")
      .withColumn("w",
        col("m") * (coalesce(col("lc_q10"), lit(0L)) - col("pen_q10")))
      .groupBy(col("doc_id"), col("lang"), col("cls"), col("base_q10"))
      .agg(sum(col("w")).cast(LongType).as("lw"))
      .select(col("doc_id"), col("lang"), col("cls"),
        (col("base_q10") + col("lw")).as("score_q10"))
    graft.plans.TopK.perKey(scores, Seq(col("doc_id")),
        Seq(col("score_q10").desc, col("cls").asc), 1)
      .select(col("doc_id"), col("cls").as("pred_lang"), col("score_q10"),
        col("lang").as("true_lang"),
        (col("cls") === col("lang")).as("correct"))
      .orderBy("doc_id")
  }
}
