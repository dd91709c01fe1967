package graft

import java.nio.file.Files

import graft.operators.FileMetaOps
import org.apache.spark.sql.functions._

class PartitionedSinkSpec extends GraftSpec {

  test("file_date-partitioned sink lays out day directories and overwrites dynamically") {
    val dir = Files.createTempDirectory("graft_sink").toFile.getAbsolutePath
    val records = FileMetaOps.bsiTestIdTime(spark, Sf)
      .select("doc_id", "testid", "folder_time", "file_date")
    FileMetaOps.writePartitionedByDate(records, dir)

    val dayDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("file_date=")).map(_.getName).sorted
    assert(dayDirs.length == 28) // doc_id % 28 + 1 days in 2017-06
    assert(dayDirs.head == "file_date=2017-06-01")

    val backCount = spark.read.parquet(dir).count()
    assert(backCount == records.count())

    // dynamic overwrite: re-ingesting one day replaces only that day
    val day1 = records.filter(col("file_date") === "2017-06-01")
    FileMetaOps.writePartitionedByDate(day1, dir)
    spark.catalog.refreshByPath(dir) // drop stale FileStatusCache listing
    assert(spark.read.parquet(dir).count() == backCount) // other days untouched
  }

  test("keyed upsert sink is replay-idempotent and replaces on PK (cassandra.go:208-265)") {
    import spark.implicits._
    import graft.sources.UpsertSink
    val dir = Files.createTempDirectory("graft_upsert").toFile.getAbsolutePath + "/t"

    def rec(date: String, time: Long, name: String, content: String, up: Long) =
      (date, time, "BSI/line1", "pack.zip", name, content, up)
    def batch(rows: (String, Long, String, String, String, String, Long)*) =
      rows.toSeq.toDF("file_date", "file_time", "folder", "pack", "name",
        "content", "upload_time")

    val b1 = batch(
      rec("2017-06-01", 100L, "a.txt", "v1", 10L),
      rec("2017-06-01", 100L, "b.txt", "v1", 10L),
      rec("2017-06-02", 200L, "c.txt", "v1", 10L))
    UpsertSink.upsert(b1, dir)
    assert(spark.read.parquet(dir).count() == 3)

    // exact replay: no duplicates (the agent re-sends a failed batch)
    UpsertSink.upsert(b1, dir)
    val afterReplay = spark.read.parquet(dir)
    assert(afterReplay.count() == 3)

    // same PK, newer upload_time: the row is replaced, not appended;
    // day 2017-06-02 is untouched by a batch that doesn't name it
    val b2 = batch(
      rec("2017-06-01", 100L, "a.txt", "v2", 20L),
      rec("2017-06-01", 300L, "d.txt", "v1", 20L))
    UpsertSink.upsert(b2, dir)
    val t = spark.read.parquet(dir)
    assert(t.count() == 4)
    val a = t.filter(col("name") === "a.txt").collect()
    assert(a.length == 1 && a.head.getAs[String]("content") == "v2")
    assert(t.filter(col("name") === "c.txt").count() == 1)

    // stale replay of b1 (older upload_time): last-write-wins keeps v2
    UpsertSink.upsert(b1, dir)
    val t2 = spark.read.parquet(dir)
    assert(t2.count() == 4)
    assert(t2.filter(col("name") === "a.txt").head().getAs[String]("content") == "v2")
  }

  test("table init pins the schema; drifted batches fail loudly (cassandra.go:326-360)") {
    import spark.implicits._
    import graft.sources.UpsertSink
    val dir = Files.createTempDirectory("graft_schema").toFile.getAbsolutePath + "/t"
    val b1 = Seq(("2017-06-01", 100L, "f", "p", "a.txt", "v1", 10L))
      .toDF("file_date", "file_time", "folder", "pack", "name",
        "content", "upload_time")
    // first deploy initializes the empty table with its schema sidecar
    UpsertSink.ensureTable(b1, dir)
    assert(new java.io.File(dir, UpsertSink.SchemaFile).exists())
    // an upsert into the freshly initialized (data-less) table works
    UpsertSink.upsert(b1, dir)
    assert(spark.read.parquet(dir).count() == 1)
    // same columns, different order: fine (columns-by-name contract)
    UpsertSink.upsert(b1.select("upload_time", "file_date", "file_time",
      "folder", "pack", "name", "content"), dir)
    assert(spark.read.parquet(dir).count() == 1)
    // changed type for an existing column: rejected before any write
    val drifted = Seq(("2017-06-01", "not-a-long", "f", "p", "a.txt", "v1", 10L))
      .toDF("file_date", "file_time", "folder", "pack", "name",
        "content", "upload_time")
    val ex = intercept[IllegalStateException] {
      UpsertSink.upsert(drifted, dir)
    }
    assert(ex.getMessage.contains("schema drift"))
    // and an extra column is drift too
    val extra = b1.withColumn("surprise", lit(1))
    intercept[IllegalStateException] { UpsertSink.upsert(extra, dir) }
  }

  test("compaction rewrites only fragmented partitions, preserving rows") {
    import spark.implicits._
    import graft.sources.CompactionOps
    val dir = Files.createTempDirectory("graft_compact").toFile.getAbsolutePath + "/t"

    // day 1: fragmented into 8 tiny files; day 2: already one file
    (1 to 80).map(i => ("2017-06-01", i.toLong, s"v$i"))
      .toDF("file_date", "id", "payload")
      .repartition(8).write.partitionBy("file_date").mode("append").parquet(dir)
    (81 to 90).map(i => ("2017-06-02", i.toLong, s"v$i"))
      .toDF("file_date", "id", "payload")
      .coalesce(1).write.partitionBy("file_date").mode("append").parquet(dir)

    val before = CompactionOps.stats(spark, dir).map(s => s.dir -> s.files).toMap
    assert(before("file_date=2017-06-01") == 8)
    assert(before("file_date=2017-06-02") == 1)
    val day2File = new java.io.File(s"$dir/file_date=2017-06-02")
      .listFiles.filter(_.getName.endsWith(".parquet")).head.getName

    val rewritten = CompactionOps.compact(spark, dir)
    assert(rewritten == Seq("file_date=2017-06-01"))
    val after = CompactionOps.stats(spark, dir).map(s => s.dir -> s.files).toMap
    assert(after("file_date=2017-06-01") == 1)
    // untouched partition keeps its exact files
    assert(new java.io.File(s"$dir/file_date=2017-06-02")
      .listFiles.filter(_.getName.endsWith(".parquet")).head.getName == day2File)
    // data identical
    val back = spark.read.parquet(dir)
    assert(back.count() == 90)
    assert(back.agg(sum("id")).head.getLong(0) == (1 to 90).map(_.toLong).sum)

    // crash healing: simulate a swap interrupted between the two
    // renames — live dir gone, data in the dot-old dir
    val live = new java.io.File(s"$dir/file_date=2017-06-01")
    val orphan = new java.io.File(s"$dir/.file_date=2017-06-01_old")
    assert(live.renameTo(orphan))
    CompactionOps.compact(spark, dir)
    assert(live.isDirectory && !orphan.exists)
    assert(spark.read.parquet(dir).count() == 90)
  }
}
