package graft.operators

import graft.Tables
import graft.functions.{ZMath, ZOrderFns}
import graft.sources.LayoutStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** D64: Z-order clustered storage — the lakehouse `OPTIMIZE ZORDER BY`
  * pattern as a first-class layout family. A time-series table is
  * queried by RECTANGLES (a time window × a value band: "errors worth
  * 100–200 last week"), and a table sorted by any single column can
  * only skip files for that column. Interleaving the two dimensions'
  * cell coordinates into one Morton key and PARTITIONING by its
  * prefix gives every 2-D rectangle a small covering set of z-cells,
  * so the probe prunes at the FILE LISTING level (`PartitionFilters`)
  * — at 100 TB the rectangle touches (rect area / table area) of the
  * directories and never lists, opens, or reads the rest.
  *
  * Cell mapping: each dimension is affinely scaled to [0, 2¹⁰) using
  * the persisted min/max model (the SQ8-model pattern — a 1-row
  * table). The time axis maps with pure Long arithmetic; the value
  * axis with the same double expression on both the column and the
  * driver side, and BOTH maps are weakly monotone, so driver-computed
  * corner cells give a CONSERVATIVE cover — pruning efficiency
  * depends on the model, correctness never does (the exact predicate
  * still runs inside the probed cells; the DuckDB oracle is the plain
  * full-scan rectangle, so hash parity proves losslessness).
  */
object ZOrderOps {

  val CellBits = 10 // 1024 cells per dimension
  val PrefixBits = 3 // zp = 6-bit interleaved prefix → ≤ 64 directories
  val Tag = s"c${CellBits}p$PrefixBits"

  /** The oracled probe rectangle: 5 of 30 days × ~1/5 of the value
    * range — selective on both axes, which is exactly the shape
    * single-column clustering cannot skip for.
    */
  val RectT1 = "2024-01-10 00:00:00"
  val RectT2 = "2024-01-15 00:00:00"
  val RectV1 = 100.0
  val RectV2 = 200.0

  private def modelTable(dir: String) =
    LayoutStore.tableName(s"zorder_model_$Tag", dir)
  private def eventsTable(dir: String) =
    LayoutStore.tableName(s"zorder_events_$Tag", dir)

  /** Both tables, for the layout drop/purge hygiene in LayoutOps. */
  def tableNames(dir: String): Seq[String] =
    Seq(modelTable(dir), eventsTable(dir))

  /** The 1-row affine model: time/value min-max envelope. */
  private[graft] def modelFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(unix_millis(col("ts")).as("ms"), col("value"))
      .agg(min(col("ms")).as("tmin"), max(col("ms")).as("tmax"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      .withColumn("d", lit(0L))
      .select("d", "tmin", "tmax", "vmin", "vmax")

  /** Cell coordinate of a time — clamp, scale, floor. The SAME double
    * ops as the column map (JVM IEEE on both sides), and every step
    * is weakly monotone, so driver corners bound column cells.
    * (ms − tmin)·1023 ≤ ~2.7×10¹² ≪ 2⁵³: the product is exact.
    */
  private[graft] def timeCell(ms: Long, tmin: Long, tmax: Long): Long = {
    val span = math.max(1L, tmax - tmin).toDouble
    val clamped = math.min(math.max(ms, tmin), tmax)
    math.floor((clamped - tmin).toDouble * CellMax / span).toLong
  }

  /** Cell coordinate of a value (same contract as [[timeCell]]). */
  private[graft] def valueCell(v: Double, vmin: Double, vmax: Double): Long = {
    val span = math.max(vmax - vmin, 1e-9)
    math.floor((math.min(math.max(v, vmin), vmax) - vmin) * CellMax / span)
      .toLong
  }

  private val CellMax = ((1 << CellBits) - 1).toDouble

  /** The z-ordered events frame: raw columns + the Morton key and its
    * directory prefix, cell maps inlined as plan literals from the
    * model row (identical double arithmetic to the driver-side cells).
    */
  private[graft] def zorderedFrame(spark: SparkSession, dir: String,
      tmin: Long, tmax: Long, vmin: Double, vmax: Double): DataFrame = {
    val tspan = math.max(1L, tmax - tmin).toDouble
    val vspan = math.max(vmax - vmin, 1e-9)
    val ms = unix_millis(col("ts"))
    val cx = floor((least(greatest(ms, lit(tmin)), lit(tmax)) - lit(tmin))
      .cast("double") * lit(CellMax) / lit(tspan)).cast(LongType)
    val cy = floor((least(greatest(col("value"), lit(vmin)), lit(vmax)) -
      lit(vmin)) * lit(CellMax) / lit(vspan)).cast(LongType)
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withColumn("z", ZOrderFns.zInterleave(cx, cy))
      .withColumn("zp", shiftright(col("z"), 2 * (CellBits - PrefixBits)))
  }

  /** Make both layout tables servable; returns the paths taken. */
  def ensure(spark: SparkSession, dir: String): (String, String) = {
    val mPath = LayoutStore.ensure(spark, modelTable(dir), Seq("d"), 1)(
      modelFrame(spark, dir))
    val m = LayoutStore.read(spark, modelTable(dir)).first()
    val ePath = LayoutStore.ensurePartitioned(spark, eventsTable(dir),
      "zp", "z")(zorderedFrame(spark, dir, m.getAs[Long]("tmin"),
      m.getAs[Long]("tmax"), m.getAs[Double]("vmin"), m.getAs[Double]("vmax")))
    (mPath, ePath)
  }

  /** The covering zp cells of a rectangle — a pure driver-side
    * computation over the model row: corner cells → prefix ranges →
    * their interleavings. O(4^PrefixBits) worst case, no data touched.
    */
  private[graft] def coveringZp(tmin: Long, tmax: Long, vmin: Double,
      vmax: Double, t1: Long, t2: Long, v1: Double, v2: Double): Seq[Long] = {
    val s = CellBits - PrefixBits
    val px1 = timeCell(t1, tmin, tmax) >> s
    val px2 = timeCell(t2, tmin, tmax) >> s
    val py1 = valueCell(v1, vmin, vmax) >> s
    val py2 = valueCell(v2, vmin, vmax) >> s
    for (px <- px1 to px2; py <- py1 to py2)
      yield ZMath.interleave(px, py) // zp interleaves the PREFIX bits
  }

  /** D64's probe: the oracled rectangle served from the persisted
    * z-layout — literal zp IN (covering cells) prunes the partition
    * directories, the exact predicate trims inside them.
    */
  def rectProbe(spark: SparkSession, dir: String): DataFrame = {
    ensure(spark, dir)
    val m = LayoutStore.read(spark, modelTable(dir)).first()
    val (tmin, tmax, vmin, vmax) = (m.getAs[Long]("tmin"),
      m.getAs[Long]("tmax"), m.getAs[Double]("vmin"), m.getAs[Double]("vmax"))
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    def msOf(s: String) = java.time.Instant.from(fmt.parse(s)).toEpochMilli
    val (t1, t2) = (msOf(RectT1), msOf(RectT2))
    val zps = coveringZp(tmin, tmax, vmin, vmax, t1, t2, RectV1, RectV2)
    LayoutStore.read(spark, eventsTable(dir))
      .filter(col("zp").isin(zps: _*))
      .filter(unix_millis(col("ts")) >= t1 && unix_millis(col("ts")) < t2 &&
        col("value") >= RectV1 && col("value") < RectV2)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
  }
}
