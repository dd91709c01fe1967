package graft

import graft.operators.EventOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B26: the keyless binned range join. The kernel's claim — bucket
  * equi-join + residual filter ≡ the naive theta join, every true pair
  * exactly once — is checked against a literal crossJoin+filter on
  * real data AND on adversarial synthetic geometry (boundary-sitting
  * events, bucket-straddling and multi-bucket intervals, overlapping
  * intervals).
  */
class IntervalJoinSpec extends GraftSpec {

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("incident_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** The naive theta join the kernel replaces. */
  private def naive(events: DataFrame, intervals: DataFrame): DataFrame =
    events.crossJoin(intervals)
      .filter(unix_micros(col("ts")) >= col("s_us") &&
        unix_micros(col("ts")) < col("e_us"))

  private def syntheticEvents(tsUs: Seq[Long]): DataFrame = {
    import spark.implicits._
    tsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
  }

  test("B26 kernel ≡ naive theta join on real sf0.001 incidents") {
    val ev = Tables.events(spark, Sf)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val incidents = ev
      .filter(col("event_type") === "error" &&
        col("value") > EventOps.IncidentValueMin)
      .select(col("event_id").as("incident_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) + EventOps.IncidentWindowMicros).as("e_us"))
    val got = pairs(EventOps.binnedIntervalJoin(
      ev.select(col("event_id"), col("ts")), incidents,
      EventOps.IncidentWindowMicros))
    val want = pairs(naive(ev.select(col("event_id"), col("ts")), incidents))
    assert(want.nonEmpty, "threshold produced no incidents at sf0.001")
    assert(got == want)
  }

  test("B26 kernel: boundary geometry — end-exclusive, start-inclusive, straddles, multi-bucket, overlaps, exactly-once") {
    import spark.implicits._
    val bucket = 100L
    // intervals: inside one bucket / straddling a boundary / spanning
    // 4 buckets / two overlapping / zero-coverage corner (s==e-1)
    val intervals = Seq(
      (1L, 110L, 160L),  // inside bucket 1
      (2L, 180L, 220L),  // straddles buckets 1|2
      (3L, 50L, 420L),   // spans buckets 0..4
      (4L, 190L, 230L),  // overlaps interval 2
      (5L, 399L, 400L)   // 1-µs interval ending ON a bucket boundary
    ).toDF("incident_id", "s_us", "e_us")
    // events on every edge: starts, ends (must be excluded), bucket
    // boundaries, interior points
    val ev = syntheticEvents(Seq(
      110L, 159L, 160L, 180L, 199L, 200L, 219L, 220L, 229L,
      50L, 100L, 300L, 399L, 400L, 419L, 420L, 0L, 500L))
    val got = EventOps.binnedIntervalJoin(ev, intervals, bucket)
    val want = pairs(naive(ev, intervals))
    assert(pairs(got) == want)
    // exactly-once: no pair may appear twice even when the interval
    // explodes into 5 bucket rows
    assert(got.count() == want.size.toLong)
    // spot-pin the semantics the set compare already implies
    assert(want.contains((1L, 0L)))   // start-inclusive
    assert(!want.contains((1L, 2L)))  // end-exclusive (ts == e_us)
    assert(want.contains((3L, 9L)) && want.contains((3L, 14L)))
    assert(want.contains((5L, 12L)) && !want.contains((5L, 13L)))
  }

  test("B26 query matches its own re-derivation and emits stable types") {
    val df = EventOps.incidentJoin(spark, Sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // schema: all hash-stable leaf types (the r10 emission contract)
    assert(df.schema.fields.map(_.dataType.typeName).toSet
      .subsetOf(Set("long", "string")))
    // n_users <= n_events per row
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events"))
    }
  }
}
