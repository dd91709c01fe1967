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

  private def mirrorDir(dir: String, fmt: String): String =
    s"/tmp/graft_ingest/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$fmt"

  /** Write the fixture once per (dir, format); `_SUCCESS` gates. */
  private def ensureMirror(spark: SparkSession, dir: String,
      fmt: String): String = {
    val out = mirrorDir(dir, fmt)
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
    // Spark disallows queries that reference ONLY the internal corrupt
    // column over a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    // the documented workaround is materializing the parsed rows first.
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
      .cache()
      .agg(count(lit(1)).as("n_lines"),
        count(col("_corrupt_record")).as("n_corrupt"),
        (count(lit(1)) - count(col("_corrupt_record"))).as("n_clean"))
  }
}
