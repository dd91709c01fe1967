package graft

import java.nio.file.Files

import graft.functions.{ContentFns, PathFns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end streaming ingest: a watched directory of parquet file
  * batches (the agent's event feed) streams through FileMeta
  * enrichment + content policy into the Kafka envelope — the full
  * reference pipeline as one Structured Streaming query.
  */
class FileIngestStreamSpec extends GraftSpec {
  import spark.implicits._

  test("file-watch stream enriches and envelopes records") {
    val dir = Files.createTempDirectory("graft_ingest").toFile
    val schema = StructType(Seq(
      StructField("path", StringType), StructField("content", StringType),
      StructField("host", StringType), StructField("mtime_ms", LongType)))

    // one micro-batch of "discovered files"
    Seq(
      ("LOUP/1395T2936101/2017-06-07/T1/FLOWLOG.TXT", "line1 line2", "m1", 1496851200000L),
      ("SPI/Rockaway/a/b/wide.dat", "d".repeat(2000), "m2", 1496851201000L))
      .toDF("path", "content", "host", "mtime_ms")
      .write.mode("append").parquet(dir.getAbsolutePath)

    val stream = spark.readStream.schema(schema)
      .parquet(dir.getAbsolutePath)
      .withColumn("folder", PathFns.folder(col("path")))
      .withColumn("name", PathFns.filename(col("path")))
      .withColumn("ext", PathFns.ext(col("path")))
      .withColumn("size", length(col("content")).cast(LongType))
      .withColumn("compress", ContentFns.shouldCompress(col("size"), col("ext")))
      .select(
        date_format(timestamp_millis(col("mtime_ms")), "yyyy-MM-dd").as("file_date"),
        col("mtime_ms").as("file_time"), col("folder"), lit("").as("pack"),
        col("name"), col("size"), col("mtime_ms").as("modify_time"),
        col("content"), col("compress"),
        when(col("compress"), length(ContentFns.gzipCompress(
          encode(col("content"), "UTF-8"))).cast(LongType))
          .otherwise(col("size")).as("compress_size"),
        ContentFns.checksum(col("content")).as("checksum"),
        col("host"), col("mtime_ms").as("folder_time"))

    val enveloped = graft.streaming.StreamOps.kafkaEnvelope(stream)
    val q = enveloped.writeStream.format("memory").queryName("ingest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ingest").collect()
      assert(rows.length == 2)
      val keys = rows.map(_.getAs[String]("key")).sorted
      assert(keys(0) == "LOUP/1395T2936101/2017-06-07/T1/FLOWLOG.TXT")
      assert(keys(1) == "SPI/Rockaway/a/b/wide.dat")
      val big = rows.find(_.getAs[String]("key").endsWith(".dat")).get
      val v = big.getAs[String]("value")
      assert(v.contains("\"compress\":true"))
      assert(v.contains("\"checksum\":\""))
    } finally q.stop()
  }
}
