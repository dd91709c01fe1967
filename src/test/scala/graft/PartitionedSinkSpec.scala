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
}
