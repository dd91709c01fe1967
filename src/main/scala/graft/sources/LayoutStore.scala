package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent storage for the engine's layout artifacts (SURVEY §2
  * r8: "persist the layouts") — the bridge from session-resident
  * engine to restartable production system. Every artifact the
  * session memoizes in [[graft.Memo]] (IVF-PQ coded lists, inverted
  * postings, the corpus manifest/keeper map/CC labels, MinHash band
  * signatures) can be written ONCE as a bucketed external parquet
  * table and served by any later session from the table alone — no
  * rebuild, no memo state.
  *
  * Why bucketed: the groupBy/repartition exchange that builds each
  * layout IS the layout (cf. SURVEY D35) — bucketBy(probe-key)
  * persists that exchange, so a probe reads only its buckets
  * (SelectedBucketsCount pruning with literal keys) and co-keyed
  * joins elide their exchanges entirely.
  *
  * Why external (explicit LOCATION under the warehouse): catalog
  * metadata in the default in-memory catalog dies with the JVM, the
  * files must not. [[ensure]] re-registers a table over its surviving
  * files with the SAME bucket spec (Spark recovers per-file bucket
  * ids from the bucketed file names), which is exactly the restart
  * path a production deployment runs.
  */
object LayoutStore {

  /** Layout format version — part of every table name, so a geometry
    * or builder change can never serve a stale layout written by an
    * older engine.
    */
  val Version = 1

  /** Deterministic table + path name per (family, source dir). */
  def tableName(family: String, dir: String): String = {
    val sf = dir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("_+", "_")
      .replaceAll("^_|_$", "")
    s"graft_layout_v${Version}_${family}_$sf"
  }

  private def warehouse(spark: SparkSession): String =
    spark.conf.get("spark.sql.warehouse.dir")
      .replaceFirst("^file:", "")

  private def location(spark: SparkSession, table: String): String =
    s"${warehouse(spark)}/graft_layouts/$table"

  /** Serve a layout table (the read side — a plain catalog read; the
    * bucket spec rides from the catalog entry).
    */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  def exists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  /** Make `table` servable, choosing the cheapest sufficient path:
    *  1. already in the catalog → nothing to do;
    *  2. files survive at the layout location (prior JVM wrote them,
    *     catalog died with it) → re-register the table over the files
    *     with the same bucket spec — the RESTART path, O(metadata);
    *  3. nothing on disk → build the frame and write it bucketed —
    *     the layout shuffle, paid exactly once per (family, dir,
    *     version).
    * Returns the path taken, for specs/bench to assert on.
    */
  def ensure(spark: SparkSession, table: String, bucketKeys: Seq[String],
      buckets: Int)(build: => DataFrame): String = synchronized {
    if (exists(spark, table)) "catalog"
    else {
      val loc = location(spark, table)
      if (Files.exists(Paths.get(loc))) {
        register(spark, table, loc, bucketKeys, buckets)
        "reregistered"
      } else {
        write(spark, table, build, bucketKeys, buckets)
        "written"
      }
    }
  }

  /** Write a layout frame as a bucketed EXTERNAL parquet table (files
    * under the warehouse's graft_layouts/, metadata in the session
    * catalog). Sorted within buckets by the bucket keys so probe
    * scans are run-length friendly.
    */
  def write(spark: SparkSession, table: String, df: DataFrame,
      bucketKeys: Seq[String], buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", location(spark, table))
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .saveAsTable(table)

  /** Drop ONLY the catalog entry (external table ⇒ files survive) —
    * exactly what a JVM exit does to the in-memory catalog. Specs use
    * this to exercise the restart path without forking a JVM.
    */
  def dropCatalogEntry(spark: SparkSession, table: String): Unit =
    synchronized { spark.sql(s"DROP TABLE IF EXISTS $table") }

  /** Remove a layout completely: catalog entry AND files (test
    * hygiene; production would only ever do this to reclaim a
    * superseded geometry's tables).
    */
  def purge(spark: SparkSession, table: String): Unit = synchronized {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    def rec(p: java.io.File): Unit = {
      val cs = p.listFiles(); if (cs != null) cs.foreach(rec); p.delete(); ()
    }
    rec(new java.io.File(location(spark, table)))
  }

  /** Re-attach a catalog entry to surviving layout files: CREATE
    * TABLE over the location with the original bucket spec. The
    * schema is recovered from the parquet footers; bucket ids are
    * recovered per file from the bucketed file names, so the
    * re-registered table serves identically to the original.
    */
  private def register(spark: SparkSession, table: String, loc: String,
      bucketKeys: Seq[String], buckets: Int): Unit = {
    val schema = spark.read.parquet(loc).schema.toDDL
    val cluster = bucketKeys.mkString(", ")
    spark.sql(
      s"""CREATE TABLE $table ($schema)
         |USING PARQUET
         |CLUSTERED BY ($cluster) SORTED BY ($cluster) INTO $buckets BUCKETS
         |LOCATION '$loc'""".stripMargin)
  }
}
