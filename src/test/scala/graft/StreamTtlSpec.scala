package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.{Ev, StreamOps}
import org.apache.spark.sql.types._

/** TTL / late-arrival edge cases of the r8 per-user state machines —
  * the two hazards a review pass caught: (1) a key whose TTL lapses
  * while IGNORED traffic keeps it in every micro-batch never gets the
  * timeout callback, and re-setting a timeout below the watermark is
  * an error Spark throws on — the data path must apply the timeout's
  * semantics itself; (2) a late-but-within-watermark event arriving
  * behind an already-applied fill must not overwrite it (the fill is
  * last-by-(ts, event_id), the batch window's ordering).
  */
class StreamTtlSpec extends GraftSpec {
  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def addFile(dir: String, evs: Ev*): Unit =
    evs.toSeq.toDF().coalesce(1).write.mode("append").parquet(dir)

  test("funnel: lapsed TTL under ignored traffic flushes on the data path (no below-watermark timeout)") {
    val in = Files.createTempDirectory("ttl_fun_in").toFile.getAbsolutePath
    val q = StreamOps.funnelStream(
        spark.readStream.schema(evSchema).parquet(in).as[Ev],
        ttlMs = 5 * 60 * 1000, watermark = "0 seconds")
      .writeStream.format("memory").queryName("ttl_fun")
      .outputMode("append").start()
    try {
      // batch 1: u7 latches a view at 10:00; u9's view pushes the
      // watermark to 10:20 — past u7's 10:05 TTL target
      addFile(in, Ev(1, ts(10, 0), 7, "view", 1.0),
        Ev(2, ts(10, 20), 9, "view", 1.0))
      q.processAllAvailable()
      // batch 2: u7 receives only a NON-funnel event — the data path
      // runs for u7 with its TTL already lapsed (the old code threw
      // 'timeout timestamp cannot be earlier than the watermark' here)
      addFile(in, Ev(3, ts(10, 30), 7, "error", 1.0))
      q.processAllAvailable()
      // batch 3: unrelated traffic advances the watermark so u9's
      // still-open funnel times out through the normal callback
      addFile(in, Ev(4, ts(11, 0), 11, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ttl_fun")
        .select("user_id", "t_view", "funnel_depth")
        .as[(Long, Timestamp, Long)].collect().toSeq.sorted
      assert(rows.contains((7L, ts(10, 0), 1L)),
        s"u7's lapsed funnel must flush on the data path: $rows")
      assert(rows.contains((9L, ts(10, 20), 1L)),
        s"u9's funnel must flush via the timeout callback: $rows")
    } finally q.stop()
  }

  test("resample: a late event behind the applied fill is ignored (last-by-(ts,id) fill preserved)") {
    val in = Files.createTempDirectory("ttl_rs_in").toFile.getAbsolutePath
    val q = StreamOps.resampleStream(
        spark.readStream.schema(evSchema).parquet(in).as[Ev],
        ttlMs = 10L * 24 * 3600 * 1000, watermark = "10 minutes")
      .writeStream.format("memory").queryName("ttl_rs")
      .outputMode("append").start()
    try {
      addFile(in, Ev(1, ts(10, 0), 7, "view", 1.0),
        Ev(2, ts(10, 50), 7, "view", 2.0))
      q.processAllAvailable()
      // watermark is now 10:40 — a 10:42 event is late but legal, and
      // arrives BEHIND the already-applied 10:50 fill
      addFile(in, Ev(3, ts(10, 42), 7, "view", 99.0))
      q.processAllAvailable()
      addFile(in, Ev(4, ts(11, 20), 7, "view", 4.0))
      q.processAllAvailable()
      val fills = spark.table("ttl_rs")
        .select("ts", "last_event_id").as[(Timestamp, Option[Long])]
        .collect().toMap
      assert(fills(ts(10, 45)) == Some(1L), s"pre-late grid: $fills")
      // the 11:00 and 11:15 grid points must carry event 2 (@10:50),
      // not the late event 3 that arrived behind it
      assert(fills(ts(11, 0)) == Some(2L) && fills(ts(11, 15)) == Some(2L),
        s"late event must not overwrite the fill: $fills")
    } finally q.stop()
  }
}
