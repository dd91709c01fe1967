package graft.operators

import graft.Tables
import graft.functions.Exact._
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** D41-family: data-quality profiling for corpus intake — the
  * deequ-style analyzer a 100 TB ingest runs BEFORE spending compute
  * on curation (reference has no analogue; this is the intake-gate
  * layer a production pipeline needs).
  *
  * Scale design: ALL metrics of a profile (and all gate measurements)
  * are batched into ONE aggregation over ONE scan — at 100 TB a scan
  * per metric is the difference between a 10-minute and a 10-hour
  * intake check. The distinct-count metrics ride Spark's Expand
  * rewrite (still a single shuffle with partial aggregation); every
  * other metric partial-aggregates map-side. The long (col, metric,
  * value) output shape is produced by exploding the single aggregate
  * row — constant-size driver work.
  */
object ProfileOps {

  /** SCHEMA-DRIVEN one-pass profiler — the generic engine behind the
    * D41 queries. Per column: null + distinct counts; numerics add
    * min/max/exact-decimal mean; strings add `<col>_len` length
    * stats; timestamps add epoch-µs min/max; arrays add `<col>_len`
    * element-count stats (the dimension-consistency check an
    * embedding intake needs). Everything is ONE aggregation over ONE
    * scan regardless of column count, exploded to long form from the
    * single aggregate row.
    */
  def profileOn(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val specs = scala.collection.mutable.ArrayBuffer.empty[(String, String, Column)]
    specs += (("table", "n_rows", count(lit(1)).cast(DoubleType)))
    df.schema.fields.foreach { f =>
      val c = col(f.name)
      specs += ((f.name, "n_null", (count(lit(1)) - count(c)).cast(DoubleType)))
      specs += ((f.name, "n_distinct", countDistinct(c).cast(DoubleType)))
      def lenStats(l: Column): Unit = {
        specs += ((s"${f.name}_len", "min", min(l).cast(DoubleType)))
        specs += ((s"${f.name}_len", "max", max(l).cast(DoubleType)))
        specs += ((s"${f.name}_len", "mean", davg(l)))
      }
      f.dataType match {
        case ShortType | IntegerType | LongType | FloatType | DoubleType =>
          specs += ((f.name, "min", min(c).cast(DoubleType)))
          specs += ((f.name, "max", max(c).cast(DoubleType)))
          specs += ((f.name, "mean", davg(c)))
        case StringType => lenStats(length(c).cast(LongType))
        case TimestampType =>
          specs += ((f.name, "min_us", min(unix_micros(c)).cast(DoubleType)))
          specs += ((f.name, "max_us", max(unix_micros(c)).cast(DoubleType)))
        case _: ArrayType => lenStats(size(c).cast(LongType))
        case _ => ()
      }
    }
    // r16 (guide §2.3, shuffle fewer bytes): mixing the countDistinct
    // metrics into the same Dataset.agg as the plain ones makes
    // Catalyst's multi-distinct rewrite key the gid=0 Expand group on
    // EVERY distinct column at once — the partial aggregate hashes
    // (n_distinct_cols + 1) × n_rows rows on an all-columns key (every
    // row unique, zero map-side reduction) and the exchange ships them
    // 36 columns wide, payload strings included. Split instead:
    //  - plain metrics: ONE streaming aggregation (map-side partials,
    //    one row per partition crosses the wire);
    //  - distinct counts: their own aggregation, where the Expand rows
    //    are (gid, value) NARROW and the partial aggregate dedupes per
    //    column, so the exchange carries Σ per-column distincts.
    // Both single-row results combine with a broadcast cross join (1×1
    // rows). Two scans of the input instead of one — at scale, a second
    // scan is far cheaper than shuffling the table ~7× its width (the
    // measured local effect is the same: 2.84 s → see OPTIMIZATION_r16).
    // Same aggregates, bit-identical output.
    val (distSpecs, plainSpecs) = specs.zipWithIndex
      .partition(_._1._2 == "n_distinct")
    val aggPlain = df.agg(
      plainSpecs.head._1._3.as(s"m${plainSpecs.head._2}"),
      plainSpecs.tail.map { case ((_, _, e), i) => e.as(s"m$i") }.toSeq: _*)
    val agg =
      if (distSpecs.isEmpty) aggPlain
      else aggPlain.crossJoin(df.agg(
        distSpecs.head._1._3.as(s"m${distSpecs.head._2}"),
        distSpecs.tail.map { case ((_, _, e), i) => e.as(s"m$i") }.toSeq: _*))
    agg.select(explode(array(specs.zipWithIndex.map { case ((cn, mt, _), i) =>
        struct(lit(cn).as("col_name"), lit(mt).as("metric"),
          col(s"m$i").as("value"))
      }.toSeq: _*)).as("m"))
      .select(col("m.col_name"), col("m.metric"), col("m.value"))
      .orderBy("col_name", "metric")
  }

  /** D41: the documents-table profile (26 metrics from one pass). */
  def dataProfile(spark: SparkSession, dir: String): DataFrame =
    profileOn(Tables.documents(spark, dir))

  /** D41b: the events-table profile — timestamps profiled as epoch-µs
    * bounds, the JSON props bag by payload length.
    */
  def eventsProfile(spark: SparkSession, dir: String): DataFrame =
    profileOn(Tables.events(spark, dir))

  /** D41c: the embeddings-table profile — the array column's element
    * counts are the dimension-consistency gate of a vector intake
    * (every vector must have the model's dimension; a min ≠ max here
    * is a corrupt batch).
    */
  def embeddingsProfile(spark: SparkSession, dir: String): DataFrame =
    profileOn(Tables.embeddings(spark, dir))

  /** The languages the pipeline's curation models cover (cf.
    * TextOps.langId's alphabet).
    */
  val KnownLangs: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  /** D42: constraint gates over the same single pass — each gate is a
    * (share-style measurement, threshold, verdict) row. The measured
    * shares are integer-count ratios (exact in IEEE doubles), so the
    * verdicts are engine-exact, not tolerance-based.
    */
  def qualityGates(spark: SparkSession, dir: String): DataFrame =
    qualityGatesOn(Tables.documents(spark, dir))

  private def shareOf(cond: Column): Column =
    count(when(cond, lit(1))).cast(DoubleType) /
      count(lit(1)).cast(DoubleType)

  /** The 5 share-style gate measurements (every one streamable — no
    * distinct aggregation), shared by the batch, windowed, and
    * streaming faces.
    */
  private def shareAggs: Seq[Column] = Seq(
    (count(col("doc_id")).cast(DoubleType) / count(lit(1)).cast(DoubleType))
      .as("doc_id_complete"),
    shareOf(col("lang").isin(KnownLangs: _*)).as("lang_known"),
    shareOf(col("n_chars") === length(col("text"))).as("n_chars_consistent"),
    shareOf(col("n_chars").between(1, 1000000)).as("n_chars_in_range"),
    shareOf(length(col("text")) > 0).as("text_nonempty"))

  private def gateStruct(name: String, thr: Double): Column =
    struct(lit(name).as("gate"), col(name).as("measured"),
      lit(thr).as("threshold"), (col(name) >= thr).as("pass"))

  private val ShareGates: Seq[(String, Double)] = Seq(
    "doc_id_complete" -> 1.0, "lang_known" -> 0.99,
    "n_chars_consistent" -> 0.99, "n_chars_in_range" -> 0.99,
    "text_nonempty" -> 0.99)

  /** [[qualityGates]] over an arbitrary documents-shaped frame — the
    * real API face (a pipeline gates whatever slice is arriving, not
    * only the canonical table). The uniqueness gate needs a distinct
    * aggregation, so it exists only here and in the batch query — the
    * windowed/streaming monitor carries the 5 share gates.
    */
  def qualityGatesOn(d: DataFrame): DataFrame = {
    val agg = d.agg(
      (countDistinct(col("doc_id")).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("doc_id_unique"),
      shareAggs: _*)
    agg.select(explode(array(
        (("doc_id_unique" -> 1.0) +: ShareGates)
          .map { case (g, t) => gateStruct(g, t) }: _*)).as("g"))
      .select(col("g.gate"), col("g.measured"), col("g.threshold"),
        col("g.pass"))
      .orderBy("gate")
  }

  /** D42b: the windowed batch twin of the streaming gate monitor —
    * the 5 share gates per event-time window. Shares the aggregate
    * definitions with [[qualityGatesStream]], so the streaming parity
    * spec pins both.
    */
  def qualityGatesWindowed(d: DataFrame, windowLen: String = "1 day")
      : DataFrame =
    explodeWindowGates(
      d.groupBy(window(col("ts"), windowLen)).agg(lcount.as("n_docs"),
        shareAggs: _*))

  /** E28: streaming intake-gate monitor — the 5 share gates evaluated
    * per closed event-time window on the arriving document stream
    * (the uniqueness gate needs a distinct aggregation, which
    * streaming aggregation cannot do exactly — it stays batch-side).
    * Watermark + append mode: a window's verdicts emit once, when it
    * closes; state is one partial-aggregate row per open window.
    */
  def qualityGatesStream(incoming: DataFrame, windowLen: String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    explodeWindowGates(
      incoming.withWatermark("ts", watermark)
        .groupBy(window(col("ts"), windowLen)).agg(lcount.as("n_docs"),
          shareAggs: _*))

  private def explodeWindowGates(agg: DataFrame): DataFrame =
    agg.select(col("window.start").as("w_start"), col("n_docs"),
        explode(array(ShareGates.map { case (g, t) => gateStruct(g, t) }: _*))
          .as("g"))
      .select(col("w_start"), col("n_docs"), col("g.gate"),
        col("g.measured"), col("g.threshold"), col("g.pass"))

  /** Distinct (source, token) vocabulary pairs — the shared input of
    * the exact and sketched overlap faces.
    */
  private[graft] def sourceTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("tok"))
      .distinct()

  /** D43: pairwise lexical overlap between sources — |vocab(A) ∩
    * vocab(B)| and Jaccard for every source pair. The curation signal
    * for "which crawls duplicate each other's coverage" BEFORE running
    * cross-source dedup.
    *
    * Scale design: no vocab×vocab self-join — tokens group once on the
    * high-cardinality token key, each token emits its C(|sources|,2)
    * in-row ordered pairs (bounded by the SOURCE count, not the corpus),
    * and the pair counts aggregate on a ≤|sources|² key. The per-source
    * sizes are a broadcast side table. The oracle states the naive
    * self-join SQL; hash parity proves the in-row pair rewrite.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val st = sourceTokens(spark, dir)
    val per = st.groupBy(col("source")).agg(lcount.as("n"))
    val pairs = st.groupBy(col("tok"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .select(explode(col("srcs")).as("src_a"), col("srcs"))
      .select(col("src_a"), explode(col("srcs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(lcount.as("n_common"))
    pairs
      .join(broadcast(per.select(col("source").as("src_a"), col("n").as("n_a"))),
        "src_a")
      .join(broadcast(per.select(col("source").as("src_b"), col("n").as("n_b"))),
        "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_common"),
        (col("n_common").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_common")).cast(DoubleType))
          .as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** D43b: the sketched twin — one HLL sketch per source (constant
    * bytes/source), pairwise union estimates at |sources|² driver
    * scale, overlap by inclusion–exclusion. At 100 TB this replaces
    * the token-key shuffle with a map-side sketch merge; the exact
    * face above is its accuracy oracle (tolerance-pinned in
    * ProfileSpec).
    */
  def sourceOverlapApprox(spark: SparkSession, dir: String): DataFrame = {
    val st = sourceTokens(spark, dir)
    val sk = st.groupBy(col("source"))
      .agg(hll_sketch_agg(col("tok"), lit(14)).as("sk"),
        lcount.as("n"))
    val a = sk.select(col("source").as("src_a"), col("sk").as("sk_a"),
      col("n").as("n_a"))
    val b = sk.select(col("source").as("src_b"), col("sk").as("sk_b"),
      col("n").as("n_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        (col("n_a") + col("n_b") -
          hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))))
          .as("est_common"))
      .orderBy("src_a", "src_b")
  }

  // ---------------------------------------------------------------
  // D55: corpus drift monitor — the ingest-QA check a daily 100 TB
  // crawl runs before merging: has the delta's token distribution
  // moved away from the standing corpus (new spam campaign, encoding
  // regression, topic shift)? Standing/delta = the house doc_id % 10
  // split every incremental operator uses.

  /** Per-(lang, tok) counts of one split — the drift input, one
    * partial-agg shuffle, vocab-bounded (≪ corpus).
    */
  private def splitTokCounts(spark: SparkSession, dir: String,
      delta: Boolean): DataFrame = {
    val side = Tables.documents(spark, dir)
      .filter(if (delta) col("doc_id") % 10 === 7 else col("doc_id") % 10 =!= 7)
      .select(col("lang"), explode(TextFns.tokens(col("text"))).as("tok"))
    side.groupBy("lang", "tok").agg(lcount.as("c"))
  }

  /** The STANDING distribution (lang, tok, c_base) — the frozen
    * reference artifact the drift family scores deltas against; the
    * D36-family persists it bucketed on tok.
    */
  private[graft] def driftBaseFrame(spark: SparkSession, dir: String): DataFrame =
    splitTokCounts(spark, dir, delta = false)
      .withColumnRenamed("c", "c_base")

  /** D55: top-k drifted tokens per language — |p_delta − p_base| with
    * absent-side counts 0. The probabilities are single divisions of
    * exact longs (each exactly rounded, identical on any engine), so
    * the ranking needs no tolerance; ties break on the token. Scale
    * shape: two vocab-bounded count tables, a vocab-keyed outer join,
    * per-lang totals broadcast back, bounded-heap top-k — nothing
    * scales with corpus size past the two token scans.
    */
  def corpusDrift(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    corpusDriftAgainst(spark, dir, driftBaseFrame(spark, dir), k)

  /** [[corpusDrift]] against any standing-counts source (session
    * frame or the persisted drift_base table) — the serving face; the
    * layout path cannot drift because this IS the session code.
    */
  private[graft] def corpusDriftAgainst(spark: SparkSession, dir: String,
      base: DataFrame, k: Int): DataFrame = {
    val delta = splitTokCounts(spark, dir, delta = true)
      .withColumnRenamed("c", "c_delta")
    val joined = base.join(delta, Seq("lang", "tok"), "full_outer")
      .select(col("lang"), col("tok"),
        coalesce(col("c_base"), lit(0L)).as("c_base"),
        coalesce(col("c_delta"), lit(0L)).as("c_delta"))
    val totals = joined.groupBy("lang").agg(
      sum(col("c_base")).cast(LongType).as("n_base"),
      sum(col("c_delta")).cast(LongType).as("n_delta"))
    val scored = joined.join(broadcast(totals), "lang")
      .withColumn("p_base",
        col("c_base").cast(DoubleType) / col("n_base").cast(DoubleType))
      .withColumn("p_delta",
        col("c_delta").cast(DoubleType) / col("n_delta").cast(DoubleType))
      .withColumn("drift", abs(col("p_delta") - col("p_base")))
    graft.plans.TopK.perKey(scored, Seq(col("lang")),
        Seq(col("drift").desc, col("tok").asc), k)
      .select("lang", "tok", "c_base", "c_delta", "p_base", "p_delta",
        "drift", "rnk")
      .orderBy("lang", "rnk")
  }

  /** D55b: the per-lang drift summary — total-variation-style L1
    * distance between the two distributions. The sum runs in EXACT
    * integer cross-product space (|c_delta·n_base − c_base·n_delta|
    * accumulated as DECIMAL(38,0) — order-independent, overflow-safe
    * at 10¹³-token splits), and divides by n_base·n_delta ONCE at
    * emission; a double sum of per-token |Δp| would be
    * order-dependent and hash-unstable.
    */
  def corpusDriftSummary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = splitTokCounts(spark, dir, delta = false)
      .withColumnRenamed("c", "c_base")
    val delta = splitTokCounts(spark, dir, delta = true)
      .withColumnRenamed("c", "c_delta")
    val joined = base.join(delta, Seq("lang", "tok"), "full_outer")
      .select(col("lang"), col("tok"),
        coalesce(col("c_base"), lit(0L)).as("c_base"),
        coalesce(col("c_delta"), lit(0L)).as("c_delta"))
    val totals = joined.groupBy("lang").agg(
      sum(col("c_base")).cast(LongType).as("n_base"),
      sum(col("c_delta")).cast(LongType).as("n_delta"))
    joined.join(broadcast(totals), "lang")
      .groupBy(col("lang"), col("n_base"), col("n_delta"))
      .agg(lcount.as("vocab"),
        sum(when(col("c_base") === 0, 1L).otherwise(0L)).cast(LongType)
          .as("new_tokens"),
        sum(abs(col("c_delta").cast(DecimalType(38, 0)) * col("n_base")
          - col("c_base").cast(DecimalType(38, 0)) * col("n_delta")))
          .as("l1_num"))
      .select(col("lang"), col("n_base"), col("n_delta"), col("vocab"),
        col("new_tokens"),
        (col("l1_num").cast(DoubleType) /
          (col("n_base").cast(DoubleType) * col("n_delta").cast(DoubleType)))
          .as("l1"))
      .orderBy("lang")
  }
}
