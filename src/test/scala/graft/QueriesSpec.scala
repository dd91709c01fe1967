package graft

import org.apache.spark.sql.functions._

/** Every declared query runs at sf0.001 and returns rows; every oracle
  * key exists in queries (the driver contract invariant).
  */
class QueriesSpec extends GraftSpec {

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query impl: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // The driver's hasher reads the Spark parquet directly but the
  // oracle result through DuckDB, so any type those two paths render
  // differently (decimals become Python Decimal vs float64) hash-
  // mismatches even when values are equal. Every oracled query must
  // therefore EMIT only these leaf types; exact decimal arithmetic
  // stays internal and narrows at the final projection.
  private val HashStableTypes: Set[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    // TimestampNTZ is naive on BOTH read paths (parquet isAdjusted=
    // false, DuckDB naive) so it renders identically — allowed.
    Set(StringType, LongType, IntegerType, ShortType, DoubleType,
      FloatType, BooleanType, TimestampType, TimestampNTZType, DateType)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, Sf)
      if (SparkEntry.oracleSql.contains(name)) {
        val offending = df.schema.fields
          .filterNot(f => HashStableTypes(f.dataType))
        assert(offending.isEmpty,
          s"$name emits non-hash-stable column types: " +
            offending.map(f => s"${f.name}: ${f.dataType}").mkString(", "))
      }
      val n = df.count()
      // near-dup / embedding-dup pair sets may be legitimately small at
      // the smallest sf, but must not error; all others must emit rows.
      val mayBeEmpty = Set("dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_simhash", "dedup_embedding")
      assert(n > 0 || mayBeEmpty(name), s"$name returned no rows")
    }
  }

  test("q1 aggregates are internally consistent") {
    val r = SparkEntry.queries("q1_pricing_summary")(spark, Sf).collect()
    assert(r.length == 6) // 3 returnflags x 2 linestatus
    r.foreach { row =>
      val sumQty = row.getAs[Double]("sum_qty")
      val avgQty = row.getAs[Double]("avg_qty")
      val n = row.getAs[Long]("count_order")
      assert(math.abs(sumQty / n - avgQty) < 1e-9)
    }
  }

  test("evt_cardinality_approx tracks the exact distinct counts within rsd") {
    val exact = graft.operators.EventOps.cardinality(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val approx = graft.operators.EventOps.cardinalityApprox(spark, Sf).collect()
    assert(approx.map(_.getString(0)).toSet == exact.keySet)
    approx.foreach { r =>
      val (eu, ed) = exact(r.getString(0))
      // rsd = 2% nominal; allow 5x slack for small groups
      assert(math.abs(r.getLong(2) - eu) <= math.max(1L, (eu * 0.10).toLong),
        s"${r.getString(0)} users: approx ${r.getLong(2)} vs exact $eu")
      assert(math.abs(r.getLong(3) - ed) <= math.max(1L, (ed * 0.10).toLong),
        s"${r.getString(0)} days: approx ${r.getLong(3)} vs exact $ed")
    }
  }

  test("evt_percentiles_approx lands inside the exact bracketing percentiles") {
    // the summary returns an OBSERVED value near the quantile; exact
    // interpolates — so the right envelope is not a relative
    // tolerance (tail order-statistic gaps dwarf any fixed pct at
    // small n) but the exact distribution's neighboring percentiles
    val brackets = Tables.events(spark, Sf)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.45)").as("lo50"),
        expr("percentile(value, 0.55)").as("hi50"),
        expr("percentile(value, 0.85)").as("lo90"),
        expr("percentile(value, 0.95)").as("hi90"),
        expr("percentile(value, 0.97)").as("lo99"),
        max(col("value")).as("hi99"))
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.operators.EventOps.valuePercentilesApprox(spark, Sf)
      .collect()
    assert(approx.map(_.getString(0)).toSet == brackets.keySet)
    approx.foreach { r =>
      val b = brackets(r.getString(0))
      def in(a: Double, lo: Double, hi: Double): Boolean = a >= lo && a <= hi
      assert(in(r.getDouble(1), b.getDouble(1), b.getDouble(2)),
        s"${r.getString(0)} p50 ${r.getDouble(1)}")
      assert(in(r.getDouble(2), b.getDouble(3), b.getDouble(4)),
        s"${r.getString(0)} p90 ${r.getDouble(2)}")
      assert(in(r.getDouble(3), b.getDouble(5), b.getDouble(6)),
        s"${r.getString(0)} p99 ${r.getDouble(3)}")
    }
  }

  test("evt_regression matches the plain-Scala exact-moment fit") {
    val ev = Tables.events(spark, Sf)
      .selectExpr("event_type", "value", "CAST(hour(ts) AS LONG) AS h")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val exp = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_._3).sum.toDouble
      val sxx = rows.map(r => r._3 * r._3).sum.toDouble
      // the scaled products are integral doubles (>= 2^52), so the
      // DECIMAL(38,0) cast is exact — keep them in BigDecimal (a Long
      // intermediate would saturate at ~9.2e18)
      def fp(x: Double): BigDecimal =
        BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP)
      val sy = rows.map(r => fp(r._2 * 576460752303423488.0))
        .sum.toDouble / 576460752303423488.0
      val sxy = rows.map(r => fp(r._2 * 576460752303423488.0)
        * BigDecimal(r._3)).sum.toDouble / 576460752303423488.0
      val syy = rows.map(r => fp(r._2 * r._2 * 73786976294838206464.0))
        .sum.toDouble / 73786976294838206464.0
      val dx = n * sxx - sx * sx
      val dy = n * syy - sy * sy
      val cov = n * sxy - sx * sy
      val slope = if (dx <= 0) 0.0 else cov / dx
      val icept = if (dx <= 0) 0.0 else (sy - (cov / dx) * sx) / n
      val corr = if (dx <= 0 || dy <= 0) 0.0 else cov / math.sqrt(dx * dy)
      (t, rows.length.toLong, slope, icept, corr)
    }
    val got = graft.operators.EventOps.regression(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // the exact integer/fixed-point accumulators make the aggregates
    // order-independent, so the doubles match to the last ulp or so
    assert(got.map(_._1) == exp.map(_._1))
    got.zip(exp).foreach { case (g, e) =>
      assert(g._2 == e._2)
      Seq((g._3, e._3), (g._4, e._4), (g._5, e._5)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
          s"${g._1}: $a vs $b")
      }
    }
    // correlations are genuine (bounded, and not all exactly zero)
    assert(got.forall(r => r._5 >= -1.0 && r._5 <= 1.0))
  }

  test("evt_latest_per_key has one row per user") {
    val df = SparkEntry.queries("evt_latest_per_key")(spark, Sf)
    val users = Tables.events(spark, Sf).select("user_id").distinct().count()
    assert(df.count() == users)
  }

  test("evt_upsert_latest key is unique") {
    val df = SparkEntry.queries("evt_upsert_latest")(spark, Sf)
    assert(df.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("gzip roundtrip holds for every document") {
    val df = SparkEntry.queries("gzip_content")(spark, Sf)
    assert(df.filter(!col("roundtrip_ok")).count() == 0)
    // compressible text must actually shrink on average
    val shrunk = df.filter(col("gzip_size") < col("orig_size")).count()
    assert(shrunk > df.count() / 2)
  }

  test("zip_expand yields both entries per archive") {
    val df = SparkEntry.queries("zip_expand")(spark, Sf)
    val perDoc = df.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") =!= 2).count() == 0)
  }

  test("resample grid span cap bounds a multi-year key, ffill sees full history") {
    import spark.implicits._
    val ev = Seq(
      // user 1: one event 3 years before a burst of two — uncapped
      // grid would be ~105k rows
      (1L, 10L, java.sql.Timestamp.valueOf("2021-01-01 00:00:00"), 7.0),
      (1L, 11L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (1L, 12L, java.sql.Timestamp.valueOf("2024-01-01 06:00:00"), 2.0),
      // user 2: narrow span — cap never fires
      (2L, 20L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5.0),
      (2L, 21L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 6.0))
      .toDF("user_id", "event_id", "ts", "value")
    // the loud contract: a span past the cap FAILS by default — a
    // silently truncated series is indistinguishable from a complete
    // one, so the caller must opt into trailing-window semantics
    val ex = intercept[Exception] {
      graft.operators.EventOps.resampleGrid(ev, maxSpanDays = 10).collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("maxSpanDays"),
      s"expected the contract message, got: $msgs")
    val out = graft.operators.EventOps.resampleGrid(ev, maxSpanDays = 10,
      truncateBeyondCap = true)
    val u1 = out.filter(col("user_id") === 1).collect()
    // 10 days × 96 grid points/day + the final partial day
    assert(u1.length <= 10 * 96 + 1, s"grid not capped: ${u1.length} rows")
    assert(u1.length >= 10 * 96 - 1)
    // the first capped grid point forward-fills from the 2021 event
    val first = u1.minBy(_.getTimestamp(1).getTime)
    assert(first.getLong(2) == 10L && first.getDouble(3) == 7.0)
    val u2 = out.filter(col("user_id") === 2).collect()
    assert(u2.length == 5) // 00:00..01:00 every 15 min, no cap
  }

  test("evt_pattern_match: strict consecutiveness, span bound, fixture-exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cep")
      .toFile.getAbsolutePath
    def t(m: Int, s: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")
    Seq(
      // user 1: clean view→click→purchase inside the span → ONE match
      (10L, t(0), 1L, "view", 1.0), (11L, t(1), 1L, "click", 1.0),
      (12L, t(2), 1L, "purchase", 1.0),
      // user 2: an intervening error breaks strict consecutiveness
      (20L, t(0), 2L, "view", 1.0), (21L, t(1), 2L, "error", 1.0),
      (22L, t(2), 2L, "click", 1.0), (23L, t(3), 2L, "purchase", 1.0),
      // user 3: right order but the span exceeds the bound
      (30L, t(0), 3L, "view", 1.0), (31L, t(20), 3L, "click", 1.0),
      (32L, t(51), 3L, "purchase", 1.0),
      // user 4: two overlapping completions chain (v c p) (c p) — only
      // the first starts with 'view', so one match
      (40L, t(0), 4L, "view", 1.0), (41L, t(1), 4L, "click", 1.0),
      (42L, t(2), 4L, "purchase", 1.0), (43L, t(3), 4L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = graft.operators.EventOps.patternMatch(spark, dir,
      maxSpanMin = 30).collect()
    val got = out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("id_0"),
      r.getAs[Long]("id_1"), r.getAs[Long]("id_2"),
      r.getAs[Long]("span_ms"))).toSet
    assert(got == Set((1L, 10L, 11L, 12L, 120000L),
      (4L, 40L, 41L, 42L, 120000L)), s"got $got")
    // real data: every match's ids are strictly increasing on the
    // user timeline and typed correctly
    val real = graft.operators.EventOps.patternMatch(spark, Sf).collect()
    val types = Tables.events(spark, Sf)
      .select("event_id", "event_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    real.foreach { r =>
      assert(types(r.getAs[Long]("id_0")) == "view")
      assert(types(r.getAs[Long]("id_1")) == "click")
      assert(types(r.getAs[Long]("id_2")) == "purchase")
      assert(r.getAs[Long]("span_ms") >= 0 &&
        r.getAs[Long]("span_ms") <=
          graft.operators.EventOps.PatternMaxSpanMin.toLong * 60000L)
    }
  }

  test("evt_pattern_abandoned: reasons exact on fixture; partitions the prefix matches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cep2")
      .toFile.getAbsolutePath
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      // user 1 converts → excluded from abandoned
      (10L, t("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (11L, t("2024-01-01 10:01:00"), 1L, "click", 1.0),
      (12L, t("2024-01-01 10:02:00"), 1L, "purchase", 1.0),
      // user 2 diverts to error
      (20L, t("2024-01-01 10:00:00"), 2L, "view", 1.0),
      (21L, t("2024-01-01 10:01:00"), 2L, "click", 1.0),
      (22L, t("2024-01-01 10:02:00"), 2L, "error", 1.0),
      // user 3 purchases 3 days later → too_late
      (30L, t("2024-01-01 10:00:00"), 3L, "view", 1.0),
      (31L, t("2024-01-01 10:01:00"), 3L, "click", 1.0),
      (32L, t("2024-01-04 10:02:00"), 3L, "purchase", 1.0),
      // user 4's timeline ends after the click
      (40L, t("2024-01-01 10:00:00"), 4L, "view", 1.0),
      (41L, t("2024-01-01 10:01:00"), 4L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = graft.operators.EventOps.patternAbandoned(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("abandon_reason"))
      .toMap
    assert(out == Map(2L -> "diverted", 3L -> "too_late",
      4L -> "timeline_end"), s"got $out")
    // real data: abandoned + converted PARTITION the in-span prefix
    // matches (same start event appears in exactly one of the two)
    import graft.operators.EventOps
    val prefix = EventOps.patternMatch(spark, Sf,
        pattern = EventOps.PatternSeq.init)
      .select("user_id", "id_0").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = EventOps.patternMatch(spark, Sf)
      .select("user_id", "id_0").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val abandoned = EventOps.patternAbandoned(spark, Sf)
      .select("user_id", "id_0").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((full intersect abandoned).isEmpty)
    assert((full union abandoned) == prefix,
      s"full ${full.size} + abandoned ${abandoned.size} != prefix ${prefix.size}")
  }

  test("evt_pattern_kleene: brute-force parity on the real timeline; n_mid=1 rows coincide with B25") {
    import graft.operators.EventOps
    val maxRun = EventOps.KleeneMaxRun
    val spanMs = EventOps.PatternMaxSpanMin.toLong * 60000L
    val Seq(a, b, c) = EventOps.PatternSeq
    // brute force: per user timeline scan for A B{1..maxRun} C in span
    val timeline = Tables.events(spark, Sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2.getTime, e._3))).toMap
    val exp = (for {
      (u, evs) <- timeline.toSeq; i <- evs.indices
      if evs(i)._4 == a
      r = evs.drop(i + 1).takeWhile(_._4 == b).length
      if r >= 1 && r <= maxRun && i + r + 1 < evs.length
      term = evs(i + r + 1) if term._4 == c
      span = term._2.getTime - evs(i)._2.getTime if span <= spanMs
    } yield (u, evs(i)._3, r.toLong, term._3, span)).sorted
    val got = EventOps.patternKleene(spark, Sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("id_0"),
        r.getAs[Long]("n_mid"), r.getAs[Long]("id_last"),
        r.getAs[Long]("span_ms"))).toSeq.sorted
    assert(got == exp, s"kleene ${got.length} vs brute force ${exp.length}")
    assert(got.nonEmpty, "degenerate fixture: no kleene matches")
    // the single-click slice IS B25: same anchors, same terminators
    val one = got.filter(_._3 == 1L).map(t => (t._1, t._2, t._4, t._5)).toSet
    val b25 = EventOps.patternMatch(spark, Sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("id_0"),
        r.getAs[Long]("id_2"), r.getAs[Long]("span_ms"))).toSet
    assert(one == b25, s"n_mid=1 slice ${one.size} != B25 ${b25.size}")
  }

  test("evt_pattern_spec: compiler subsumes B25 and B29, optional instance brute-forced, malformed specs rejected") {
    import graft.operators.{EventOps, PatternQuant, PatternStep}
    val spanMs = EventOps.PatternMaxSpanMin.toLong * 60000L
    // all-One instance == B25 (projected to the shared columns)
    val asB25 = EventOps.patternSpec(spark, Sf,
        EventOps.PatternSeq.map(t => PatternStep(t, PatternQuant.One)))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("id_0"),
        r.getAs[Long]("id_last"), r.getAs[Long]("span_ms"))).toSet
    val b25 = EventOps.patternMatch(spark, Sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("id_0"),
        r.getAs[Long]("id_2"), r.getAs[Long]("span_ms"))).toSet
    assert(asB25 == b25, s"all-One instance ${asB25.size} != B25 ${b25.size}")
    // One·Plus·One instance == B29 bit-for-bit on its whole schema
    val Seq(a, b, c) = EventOps.PatternSeq
    val asB29 = EventOps.patternSpec(spark, Sf, Seq(
        PatternStep(a, PatternQuant.One),
        PatternStep(b, PatternQuant.Plus(EventOps.KleeneMaxRun)),
        PatternStep(c, PatternQuant.One)))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("id_0"),
        r.getAs[Long]("n_1"), r.getAs[Long]("id_last"),
        r.getAs[Long]("span_ms"))).toSeq.sorted
    val b29 = EventOps.patternKleene(spark, Sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("id_0"),
        r.getAs[Long]("n_mid"), r.getAs[Long]("id_last"),
        r.getAs[Long]("span_ms"))).toSeq.sorted
    assert(asB29 == b29, s"One·Plus·One ${asB29.length} != B29 ${b29.length}")
    assert(asB29.nonEmpty)
    // the optional instance (B30's deployed pattern) brute-forced on
    // the real timeline: greedy — the click is consumed iff present
    val timeline = Tables.events(spark, Sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2.getTime, e._3))).toMap
    val exp = (for {
      (u, evs) <- timeline.toSeq; i <- evs.indices
      if evs(i)._4 == a
      r = if (i + 1 < evs.length && evs(i + 1)._4 == b) 1 else 0
      if i + r + 1 < evs.length
      term = evs(i + r + 1) if term._4 == c
      span = term._2.getTime - evs(i)._2.getTime if span <= spanMs
    } yield (u, evs(i)._3, r.toLong, term._3, span)).sorted
    val got = EventOps.patternSpec(spark, Sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("id_0"),
        r.getAs[Long]("n_1"), r.getAs[Long]("id_last"),
        r.getAs[Long]("span_ms"))).toSeq.sorted
    assert(got == exp, s"optional instance ${got.length} vs brute ${exp.length}")
    assert(got.exists(_._3 == 0L) && got.exists(_._3 == 1L),
      "fixture must exercise both optional branches")
    // well-formedness contract
    def steps(q: PatternQuant*): Seq[PatternStep] =
      q.zipWithIndex.map { case (qt, i) => PatternStep(s"t$i", qt) }
    intercept[IllegalArgumentException](EventOps.validatePattern(
      steps(PatternQuant.Opt, PatternQuant.One)))
    intercept[IllegalArgumentException](EventOps.validatePattern(
      steps(PatternQuant.One, PatternQuant.Plus(2))))
    intercept[IllegalArgumentException](EventOps.validatePattern(Seq(
      PatternStep("x", PatternQuant.One), PatternStep("x", PatternQuant.One))))
    intercept[IllegalArgumentException](EventOps.validatePattern(
      steps(PatternQuant.One, PatternQuant.Plus(0), PatternQuant.One)))
  }

  test("dedup_explain: pairs are the flagged set, shingles shared, df-ranked") {
    import graft.operators.{DedupOps, TextOps}
    val out = DedupOps.dedupExplain(spark, Sf).collect()
    assert(out.nonEmpty)
    // the flagged set is the D71 LOSSLESS truth at tau (r12) — the
    // exact tau-Jaccard pair set, no candidate floor
    val flagged = DedupOps.dedupPrefixFilter(spark, Sf, DedupOps.ExplainTau)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .toSet == flagged, "explained pairs != flagged pairs")
    // and on this fixture the D2-derived set at the same tau coincides
    // (the floor only matters for single-shingle documents) — the
    // re-derivation changed the SOURCE's scale shape, not the rows
    assert(flagged == DedupOps.dedupNgramJaccard(spark, Sf)
      .filter(col("jacc") >= DedupOps.ExplainTau)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    // each listed shingle appears in BOTH documents
    val texts = Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shinglesOf(id: Long): Set[String] = {
      val toks = texts(id).split(" ", -1)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    out.foreach { r =>
      val sh = r.getAs[String]("shingle")
      assert(shinglesOf(r.getAs[Long]("a_id")).contains(sh))
      assert(shinglesOf(r.getAs[Long]("b_id")).contains(sh))
    }
    // per pair: rnk contiguous, df non-decreasing with rnk
    out.groupBy(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .values.foreach { rows =>
        val sorted = rows.sortBy(_.getAs[Long]("rnk"))
        assert(sorted.map(_.getAs[Long]("rnk")).toSeq ==
          (1L to sorted.length).toSeq)
        assert(sorted.map(_.getAs[Long]("df")).toSeq ==
          sorted.map(_.getAs[Long]("df")).sorted.toSeq)
      }
  }

  test("evt_value_zscore: a constant series is never anomalous (std=0 guard)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zscore")
      .toFile.getAbsolutePath
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // heartbeat: identical values -> std = 0; z must be 0, never NaN
    Seq((1L, t(0), 1L, "heartbeat", 1.0), (2L, t(1), 1L, "heartbeat", 1.0),
      (3L, t(2), 2L, "heartbeat", 1.0), (4L, t(3), 2L, "other", 5.0),
      (5L, t(4), 2L, "other", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = graft.operators.EventOps.valueZscore(spark, dir).collect()
    val hb = out.filter(_.getAs[String]("event_type") == "heartbeat")
    assert(hb.length == 3)
    hb.foreach { r =>
      assert(r.getAs[Double]("z") == 0.0 && !r.getAs[Boolean]("is_anomaly"))
    }
    // non-degenerate types still get real z-scores
    assert(out.filter(_.getAs[String]("event_type") == "other")
      .forall(r => !r.getAs[Double]("z").isNaN))
  }
}
