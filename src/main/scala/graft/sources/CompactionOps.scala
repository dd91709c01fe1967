package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-files compaction for date-partitioned parquet tables — the
  * maintenance dual of the streaming ingest: micro-batches fragment a
  * day into many tiny files (one per trigger × task), and scan
  * parallelism then pays a task per file. Compaction decisions come
  * from the FILE LISTING only (no data scan); only flagged partitions
  * are read and rewritten, each to ceil(bytes/targetFileBytes) files,
  * swapped in atomically per partition (staging dir + rename — a copy
  * on object stores, documented). Work is proportional to the
  * fragmented days, never the table.
  */
object CompactionOps {

  final case class PartitionStat(dir: String, files: Int, bytes: Long)

  /** File-listing stats per partition directory (`file_date=*`). */
  def stats(spark: SparkSession, path: String): Seq[PartitionStat] = {
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { d =>
        val data = fs.listStatus(d.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
        PartitionStat(d.getPath.getName, data.size, data.map(_.getLen).sum)
      }
  }

  /** Compact partitions whose mean file size is below
    * `targetFileBytes / 2` and which hold more than `minFiles` files.
    * Returns the partition names rewritten.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      minFiles: Int = 4): Seq[String] = {
    val fs = FileSystem.get(new Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    val flagged = stats(spark, path).filter(s =>
      s.files > minFiles && s.bytes / math.max(1, s.files) < targetFileBytes / 2)
    flagged.foreach { p =>
      val dir = new Path(path, p.dir)
      val staging = new Path(path, s".${p.dir}_compacting")
      val n = math.max(1L, (p.bytes + targetFileBytes - 1) / targetFileBytes).toInt
      spark.read.parquet(dir.toString)
        .coalesce(n)
        .write.mode("overwrite").parquet(staging.toString)
      // drop parquet's _SUCCESS marker so the dir holds data files only
      fs.delete(new Path(staging, "_SUCCESS"), false)
      fs.delete(dir, true)
      fs.rename(staging, dir)
    }
    spark.catalog.refreshByPath(path)
    flagged.map(_.dir)
  }
}
