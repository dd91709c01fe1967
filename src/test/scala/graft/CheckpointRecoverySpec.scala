package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.{Ev, StreamOps}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Checkpoint-recovery proof for the state-backed streaming operators:
  * the reference agent persists its dedup/change state in a badger KV
  * that survives process restarts (fspolling.go:41-86, `isSaved`);
  * the Structured Streaming duals must survive a stop/restart from
  * their checkpoint the same way — saved keys are not re-emitted,
  * open bursts keep their state and still close correctly.
  *
  * MemoryStream/memory sinks do not support checkpoint restart in
  * append mode, so these tests run the real recovery path: file
  * source -> operator -> parquet sink, stop the query, append input,
  * restart from the same checkpoint dir.
  */
class CheckpointRecoverySpec extends GraftSpec {
  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def addFile(dir: String, evs: Ev*): Unit =
    evs.toSeq.toDF().coalesce(1).write.mode("append").parquet(dir)

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("E1 debounce state survives a checkpoint restart") {
    val in = tmp("ckpt_deb_in")
    val out = tmp("ckpt_deb_out")
    val ckpt = tmp("ckpt_deb_state")

    def start(): StreamingQuery =
      StreamOps.debounceStream(
        spark.readStream.schema(evSchema).parquet(in).as[Ev],
        gapMs = 5 * 60 * 1000, watermark = "0 seconds")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // run 1: user 7's burst closes (watermark passes its timeout once
    // user 8's event lands); user 8's burst is still open at stop time
    addFile(in, Ev(1, ts(0), 7, "write", 1.0), Ev(2, ts(1), 7, "write", 1.0),
      Ev(3, ts(2), 7, "create", 1.0))
    addFile(in, Ev(99, ts(30), 8, "write", 1.0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val afterRun1 = spark.read.parquet(out).as[graft.streaming.DebouncedEv].collect()
    assert(afterRun1.map(_.user_id).toSet == Set(7L))
    assert(afterRun1.head.event_id == 3 && afterRun1.head.burst_size == 3)

    // run 2 from the same checkpoint: a fresh event far past user 8's
    // gap closes the burst held in state across the restart — the
    // emitted row is batch-1's event 99, which only recovered state
    // can produce (its source offset is already committed, so a
    // state-less restart would never see it again)
    addFile(in, Ev(200, ts(59), 9, "view", 1.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val afterRun2 = spark.read.parquet(out).as[graft.streaming.DebouncedEv].collect()
    val u8 = afterRun2.filter(_.user_id == 8)
    assert(u8.length == 1, s"open burst must close after restart: ${afterRun2.toSeq}")
    assert(u8.head.event_id == 99 && u8.head.burst_size == 1 && u8.head.ts == ts(30))
    // and the already-emitted user-7 burst is not replayed
    assert(afterRun2.count(_.user_id == 7) == 1)
  }

  test("E30 anomaly baseline deque survives a checkpoint restart") {
    val in = tmp("ckpt_anom_in")
    val out = tmp("ckpt_anom_out")
    val ckpt = tmp("ckpt_anom_state")
    def dayTs(day: Int, i: Int): Timestamp =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        day * 86400000L + i * 60000L)

    def start(): StreamingQuery =
      StreamOps.dailyAnomalyStream(
        spark.readStream.schema(evSchema).parquet(in).as[Ev],
        watermark = "0 seconds")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // run 1: 4 quiet days (2 events each) close into the baseline
    // deque; the spike day (day 4, 40 events) is still OPEN at stop
    var id = 0L
    def evs(day: Int, n: Int): Seq[Ev] = (0 until n).map { i =>
      id += 1; Ev(id, dayTs(day, i), 1L, "err", 1.0)
    }
    (0 to 3).foreach(d => addFile(in, evs(d, 2): _*))
    addFile(in, evs(4, 40): _*)
    val anomSchema = implicitly[org.apache.spark.sql.Encoder[
      graft.streaming.AnomalyOut]].schema
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.schema(anomSchema).parquet(out).isEmpty,
      "spike day must still be open at stop time")

    // run 2: a day-5 event closes the spike day — flagging it needs
    // BOTH halves of recovered state (the open day's 40-count and the
    // quiet baseline deque), neither of which a state-less restart
    // could rebuild from already-committed offsets. The probe sits at
    // 00:01, STRICTLY past the day-4 boundary: the event-time timeout
    // fires only when the watermark passes the registered timestamp.
    addFile(in, Ev(9001L, dayTs(5, 1), 1L, "err", 1.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out)
      .as[graft.streaming.AnomalyOut].collect()
    assert(rows.length == 1, s"expected the spike flag, got ${rows.toSeq}")
    assert(rows.head.cnt == 40 && rows.head.mean == 2.0 &&
      rows.head.day.getTime == dayTs(4, 0).getTime)
  }

  test("E7 sessionize open-session state survives a checkpoint restart") {
    val in = tmp("ckpt_sess_in")
    val out = tmp("ckpt_sess_out")
    val ckpt = tmp("ckpt_sess_state")

    def start(): StreamingQuery =
      StreamOps.sessionizeStream(
        spark.readStream.schema(evSchema).parquet(in).as[Ev],
        gapMs = 5 * 60 * 1000, watermark = "0 seconds")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // run 1: user 7's 2-event session still open at stop time
    addFile(in, Ev(1, ts(0), 7, "click", 2.0), Ev(2, ts(2), 7, "click", 3.0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 0) // nothing closed yet

    // run 2: watermark moves past the gap -> the session held in
    // state closes with BOTH its pre-restart events aggregated
    addFile(in, Ev(99, ts(30), 8, "view", 1.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).as[graft.streaming.SessionOut].collect()
    val u7 = rows.filter(_.user_id == 7)
    assert(u7.length == 1, s"expected closed session: ${rows.toSeq}")
    assert(u7.head.n_events == 2 && u7.head.total_value == 5.0)
    assert(u7.head.t_start == ts(0) && u7.head.t_end == ts(2))
  }

  test("E25 funnel mid-stage state survives a checkpoint restart") {
    val in = tmp("ckpt_fun_in")
    val out = tmp("ckpt_fun_out")
    val ckpt = tmp("ckpt_fun_state")

    def start(): StreamingQuery =
      StreamOps.funnelStream(
        spark.readStream.schema(evSchema).parquet(in).as[Ev],
        ttlMs = 20 * 60 * 1000, watermark = "0 seconds")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // run 1: user 7 latches view + click (depth 2, open); user 8 only
    // a view. Nothing emits — both funnels are open at stop time.
    addFile(in, Ev(1, ts(0), 7, "view", 1.0), Ev(2, ts(2), 7, "click", 1.0),
      Ev(3, ts(3), 8, "view", 1.0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 0)

    // run 2 from the checkpoint: user 7's purchase COMPLETES the
    // funnel held in state (its view/click offsets are committed — a
    // state-less restart could never produce depth 3), and the far-
    // future event times out user 8's still-open depth-1 funnel.
    addFile(in, Ev(10, ts(5), 7, "purchase", 1.0))
    addFile(in, Ev(99, ts(59), 9, "error", 1.0), Ev(100, ts(59), 9, "view", 1.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).as[graft.streaming.FunnelOut].collect()
    val u7 = rows.filter(_.user_id == 7)
    assert(u7.length == 1 && u7.head.funnel_depth == 3 &&
      u7.head.t_view == ts(0) && u7.head.t_click == ts(2) &&
      u7.head.t_purchase == ts(5), s"got ${rows.toSeq}")
    val u8 = rows.filter(_.user_id == 8)
    assert(u8.length == 1 && u8.head.funnel_depth == 1 &&
      u8.head.t_click == null && u8.head.t_purchase == null,
      s"open depth-1 funnel must flush on TTL: ${rows.toSeq}")
  }

  test("E3 stream-dedup state survives a checkpoint restart") {
    val in = tmp("ckpt_dd_in")
    val out = tmp("ckpt_dd_out")
    val ckpt = tmp("ckpt_dd_state")

    def start(): StreamingQuery =
      StreamOps.dedupStream(
        spark.readStream.schema(evSchema).parquet(in), watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    addFile(in, Ev(1, ts(0), 7, "write", 1.0), Ev(2, ts(1), 7, "write", 2.0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 2)

    // replay event 1 after the restart plus a genuinely new event:
    // only recovered dedup state can drop the replayed key
    addFile(in, Ev(1, ts(0), 7, "write", 1.0), Ev(3, ts(2), 7, "write", 3.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 3, s"replayed key re-emitted: ${rows.toSeq}")
    assert(rows.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("E5 change-detect last-seen state survives a checkpoint restart") {
    val in = tmp("ckpt_chg_in")
    val out = tmp("ckpt_chg_out")
    val ckpt = tmp("ckpt_chg_state")

    def start(): StreamingQuery =
      StreamOps.changeDetectStream(
        spark.readStream.schema(evSchema).parquet(in).as[Ev])
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    addFile(in, Ev(1, ts(0), 7, "write", 1.0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val afterRun1 = spark.read.parquet(out).as[graft.streaming.KeyedChange].collect()
    assert(afterRun1.length == 1 && afterRun1.head.changed)

    // same key, same mtime after the restart: only recovered last-seen
    // state can know it is unchanged (fspolling.isSaved semantics)
    addFile(in, Ev(2, ts(0), 7, "write", 1.0), Ev(3, ts(5), 7, "write", 1.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val afterRun2 = spark.read.parquet(out).as[graft.streaming.KeyedChange].collect()
    assert(afterRun2.length == 3)
    assert(!afterRun2.find(_.event_id == 2).get.changed,
      "unchanged mtime must not be flagged after restart")
    assert(afterRun2.find(_.event_id == 3).get.changed)
  }

  test("E12 sliding-window aggregation state survives a checkpoint restart") {
    val in = tmp("ckpt_slide_in")
    val out = tmp("ckpt_slide_out")
    val ckpt = tmp("ckpt_slide_state")
    val outSchema = StructType(Seq(
      StructField("w_start", TimestampType), StructField("w_end", TimestampType),
      StructField("n_events", LongType), StructField("n_errors", LongType),
      StructField("err_rate", DoubleType)))

    def start(): StreamingQuery =
      StreamOps.slidingErrorRate(
          spark.readStream.schema(evSchema).parquet(in),
          "10 minutes", "5 minutes", watermark = "10 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // run 1: three events spread over four overlapping windows; the
    // watermark has not passed any window end, so nothing is emitted
    // and ALL partial counts live only in checkpointed state at stop
    addFile(in, Ev(1, ts(0), 1, "error", 1.0), Ev(2, ts(7), 2, "error", 1.0),
      Ev(3, ts(12), 1, "click", 1.0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.schema(outSchema).parquet(out).count() == 0)

    // run 2 from the same checkpoint: a far-future event advances the
    // watermark past every run-1 window; the finalized counts can only
    // be correct if the pre-restart partials were recovered (the
    // run-1 source files' offsets are already committed)
    addFile(in, Ev(99, Timestamp.valueOf("2024-01-01 11:30:00"), 9, "click", 1.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.schema(outSchema).parquet(out).collect()
      .map(r => (r.getTimestamp(0), r.getLong(2), r.getLong(3))).toSet
    val expect = Set(
      (Timestamp.valueOf("2024-01-01 09:55:00"), 1L, 1L),
      (Timestamp.valueOf("2024-01-01 10:00:00"), 2L, 2L),
      (Timestamp.valueOf("2024-01-01 10:05:00"), 2L, 1L),
      (Timestamp.valueOf("2024-01-01 10:10:00"), 1L, 0L))
    assert(got == expect, s"got=$got")
  }

  test("E15 near-dup pair state survives a checkpoint restart (no replay)") {
    import org.apache.spark.sql.functions.{col, lit}
    val in = tmp("ckpt_ndup_in")
    val out = tmp("ckpt_ndup_out")
    val ckpt = tmp("ckpt_ndup_state")
    val incoming = Tables.documents(spark, Sf)
      .filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("lang"), col("text"),
        lit(Timestamp.valueOf("2024-01-01 10:00:00")).as("ts"))
    val schema = incoming.schema

    def start(): StreamingQuery =
      StreamOps.nearDupStreamFor(spark, Sf,
          spark.readStream.schema(schema).parquet(in), watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // run 1: the full incoming crawl arrives; its near-dup pairs emit
    incoming.write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      StructField("a_id", LongType), StructField("b_id", LongType),
      StructField("ts", TimestampType), StructField("n_a", LongType),
      StructField("n_b", LongType), StructField("inter_cnt", LongType),
      StructField("jacc", DoubleType)))
    val run1 = spark.read.schema(outSchema).parquet(out)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(run1.nonEmpty, "fixture produced no near-dup pairs")
    assert(run1.distinct.length == run1.length, "pairs emitted twice within run 1")

    // run 2 from the same checkpoint: the SAME crawl re-arrives with
    // the same event time (inside the watermark horizon). Only the
    // recovered dropDuplicatesWithinWatermark state can suppress the
    // replayed pairs — a state-less restart would re-emit all of them.
    incoming.write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val run2 = spark.read.schema(outSchema).parquet(out)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(run2.sorted.toSeq == run1.sorted.toSeq,
      s"re-arrival emitted duplicates: ${run2.length} vs ${run1.length}")
  }

  test("E18 trending chained-agg window state survives a checkpoint restart") {
    import org.apache.spark.sql.functions.col
    val in = tmp("ckpt_trend_in")
    val out = tmp("ckpt_trend_out")
    val ckpt = tmp("ckpt_trend_state")
    val all = Tables.events(spark, Sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val schema = all.schema
    // watermark longer than the data span: NO window closes during
    // run 1, so every partial count lives purely in recovered state
    def start(): StreamingQuery =
      StreamOps.trendingStream(
          spark.readStream.schema(schema).parquet(in), watermark = "365 days")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // run 1: only half the events arrive; their windows stay OPEN
    all.filter(col("event_id") % 2 === 0).write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // run 2 from the checkpoint: the other half + a far-future flush
    // closes every window; counts must merge recovered + new state
    all.filter(col("event_id") % 2 =!= 0).write.mode("append").parquet(in)
    (0L to 3L).map(u => (888880L + u,
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), u, "x", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val outSchema = StructType(Seq(
      StructField("bucket", TimestampType), StructField("event_type", StringType),
      StructField("n_events", LongType), StructField("rnk", LongType)))
    val got = spark.read.schema(outSchema).parquet(out)
      .filter(col("bucket") < "2029-01-01")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq.sorted
    val expected = graft.operators.EventOps.trending(spark, Sf)
      .filter(col("bucket") < "2029-01-01")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(got == expected,
      s"restart merged counts wrong: ${got.length} vs ${expected.length}")
  }

  test("E17 ingest-gate ledger state survives a checkpoint restart (no replay)") {
    import org.apache.spark.sql.functions.{col, lit}
    val in = tmp("ckpt_gate_in")
    val out = tmp("ckpt_gate_out")
    val ckpt = tmp("ckpt_gate_state")
    val evalSet = graft.operators.CurationOps.demoEvalSet(spark)
    val incoming = Tables.documents(spark, Sf)
      .filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("lang"), col("text"),
        lit(Timestamp.valueOf("2024-01-01 10:00:00")).as("ts"))
    val schema = incoming.schema
    def start(): StreamingQuery =
      StreamOps.ingestGateStream(spark, Sf,
          spark.readStream.schema(schema).parquet(in), evalSet,
          minHits = 1, watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    incoming.write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("reason", StringType)))
    val run1 = spark.read.schema(outSchema).parquet(out)
      .select("doc_id", "reason").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(run1.nonEmpty, "fixture produced no gate verdicts")
    assert(run1.distinct.length == run1.length,
      "ledger rows emitted twice within run 1")

    // the SAME crawl re-arrives inside the watermark horizon; only the
    // recovered (doc, reason) suppression state stops a replay
    incoming.write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val run2 = spark.read.schema(outSchema).parquet(out)
      .select("doc_id", "reason").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(run2.sorted.toSeq == run1.sorted.toSeq,
      s"re-arrival emitted duplicates: ${run2.length} vs ${run1.length}")
  }

  test("E33 line-dedup digest state survives a checkpoint restart") {
    import org.apache.spark.sql.functions.{col, md5}
    val in = tmp("ckpt_lines_in")
    val out = tmp("ckpt_lines_out")
    val ckpt = tmp("ckpt_lines_state")
    val docSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("ts", TimestampType)))
    def mkLine(p: String) = (1 to 10).map(i => s"$p$i").mkString(" ")
    val (lineX, lineY, lineZ, lineC) =
      (mkLine("x"), mkLine("y"), mkLine("z"), mkLine("c"))
    // the standing corpus already holds lineC
    val corpus = Seq(lineC).toDF("line").select(md5(col("line")).as("h"))
    def addDoc(id: Long, text: String, t: Timestamp): Unit =
      Seq((id, text, t)).toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode("append").parquet(in)
    def start(): StreamingQuery =
      StreamOps.dedupLinesStream(
        spark.readStream.schema(docSchema).parquet(in), corpus,
        watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    addDoc(1, s"$lineX $lineY", ts(0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val run1 = spark.read.parquet(out).select("line").collect()
      .map(_.getString(0)).toSet
    assert(run1 == Set(lineX, lineY))

    // restart: lineX must be suppressed by RECOVERED digest state (its
    // source offset is committed — only the checkpoint knows it),
    // lineC by the standing-corpus anti-join, lineZ is new
    addDoc(2, s"$lineX $lineZ $lineC", ts(5))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val run2 = spark.read.parquet(out).select("doc_id", "line").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(run2 == Set((1L, lineX), (1L, lineY), (2L, lineZ)),
      s"restart state wrong: $run2")
  }
}
