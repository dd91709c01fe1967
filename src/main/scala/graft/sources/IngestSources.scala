package graft.sources

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C9/C10: text-format ingest faces — JSONL and CSV readers with
  * explicit schemas and corrupt-record capture. The reference agent
  * watches raw log files; a Spark engine replacing it must ingest the
  * common line formats, not only parquet. The fixture mirrors are
  * deterministic re-encodings of the documents table (the zip/gzip
  * fixture device), so the roundtrip queries are oracled against the
  * ORIGINAL table: a hash match proves the writer/reader pair loses
  * nothing.
  *
  * Scale notes: both readers are plain FileScan sources — splittable
  * (CSV/JSON split on line boundaries), schema explicit (no inference
  * pass over 100 TB), PERMISSIVE mode capturing malformed lines into
  * `_corrupt_record` instead of failing the job mid-crawl.
  */
object IngestSources {

  private def docSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("lang",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("source",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_chars",
      org.apache.spark.sql.types.LongType)))

  /** Mirror path key: an md5 of the RAW dir string (no sanitizer
    * collisions) plus a content fingerprint (row count + summed text
    * crc32), so a regenerated source table can never serve a stale
    * mirror. The fingerprint is one tiny aggregation, memoized per
    * session.
    */
  private def mirrorKey(spark: SparkSession, dir: String): String =
    graft.Memo.value(spark, s"ingest_mirror_key:$dir") {
      val fp = Tables.documents(spark, dir)
        .agg(count(lit(1)).cast("long"),
          sum(crc32(col("text"))).cast("long"))
        .collect()(0)
      val dirMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(12)
      s"${dirMd5}_${fp.getLong(0)}_${java.lang.Long.toHexString(fp.getLong(1))}"
    }

  private val mirrorLock = new Object

  /** Write the fixture once per (dir-content, format); `_SUCCESS`
    * gates, and a JVM-level lock serializes concurrent first builds
    * (the conc-bench shape — cf. Memo's build lock).
    */
  private def ensureMirror(spark: SparkSession, dir: String,
      fmt: String): String = mirrorLock.synchronized {
    val out = s"/tmp/graft_ingest/${mirrorKey(spark, dir)}/$fmt"
    val p = new Path(out, "_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val d = Tables.documents(spark, dir)
        .select("doc_id", "text", "lang", "source", "n_chars")
      fmt match {
        case "jsonl" => d.write.mode("overwrite").json(out)
        case "csv" => d.write.mode("overwrite")
          .option("header", "true").option("quoteAll", "true").csv(out)
      }
    }
    out
  }

  /** JSONL documents reader (explicit schema, PERMISSIVE). */
  def jsonlDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(docSchema).option("mode", "PERMISSIVE")
      .json(ensureMirror(spark, dir, "jsonl"))

  /** CSV documents reader (explicit schema, header, quotes). */
  def csvDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(docSchema).option("mode", "PERMISSIVE")
      .option("header", "true").csv(ensureMirror(spark, dir, "csv"))

  /** C9: the JSONL roundtrip face — oracled against the ORIGINAL
    * documents rows (writer+reader lose nothing).
    */
  def jsonlIngest(spark: SparkSession, dir: String): DataFrame =
    jsonlDocuments(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** C10: the CSV roundtrip face, same oracle. */
  def csvIngest(spark: SparkSession, dir: String): DataFrame =
    csvDocuments(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** Corrupt-line accounting over an arbitrary JSONL path — the
    * PERMISSIVE intake report (clean vs malformed line counts).
    */
  def jsonlHealth(spark: SparkSession, path: String): DataFrame = {
    val schema = docSchema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    // Spark disallows queries whose referenced columns are ONLY the
    // internal corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    // counting a real data column alongside keeps the scan legal
    // without caching the parsed frame for the session lifetime.
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
      .agg(count(lit(1)).as("n_lines"),
        count(col("_corrupt_record")).as("n_corrupt"),
        count(col("doc_id")).as("n_parsed_id"),
        (count(lit(1)) - count(col("_corrupt_record"))).as("n_clean"))
  }
}
