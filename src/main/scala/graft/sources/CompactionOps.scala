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
      .filter(s => s.isDirectory && s.getPath.getName.contains("=")
        && !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
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
    *
    * Swap protocol per partition (rename is not atomic across the
    * pair, so every step is recoverable): write staging → rename live
    * to `.X_old` → rename staging to live → drop `.X_old`. A crash
    * leaves dot-prefixed dirs that stats() ignores and the next
    * compact() run heals first: an orphaned `.X_old` whose live dir
    * is missing is renamed back; leftover staging dirs are discarded
    * (their source is still intact). On object stores rename is a
    * copy — slower, same safety.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      minFiles: Int = 4): Seq[String] = {
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri, spark.sparkContext.hadoopConfiguration)
    def renameOrThrow(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"compaction rename failed: $from -> $to")

    // heal leftovers of an interrupted previous run
    if (fs.exists(root)) fs.listStatus(root).toSeq.map(_.getPath).foreach { d =>
      val name = d.getName
      if (name.startsWith(".") && name.endsWith("_old")) {
        val live = new Path(root, name.stripPrefix(".").stripSuffix("_old"))
        if (!fs.exists(live)) renameOrThrow(d, live) // crashed mid-swap
        else fs.delete(d, true) // swap completed, old copy not yet dropped
      } else if (name.startsWith(".") && name.endsWith("_compacting")) {
        fs.delete(d, true) // incomplete staging; source partition intact
      }
    }

    val flagged = stats(spark, path).filter(s =>
      s.files > minFiles && s.bytes / math.max(1, s.files) < targetFileBytes / 2)
    flagged.foreach { p =>
      val dir = new Path(root, p.dir)
      val staging = new Path(root, s".${p.dir}_compacting")
      val old = new Path(root, s".${p.dir}_old")
      val n = math.max(1L, (p.bytes + targetFileBytes - 1) / targetFileBytes).toInt
      spark.read.parquet(dir.toString)
        .coalesce(n)
        .write.mode("overwrite").parquet(staging.toString)
      // drop parquet's _SUCCESS marker so the dir holds data files only
      fs.delete(new Path(staging, "_SUCCESS"), false)
      renameOrThrow(dir, old)
      renameOrThrow(staging, dir)
      fs.delete(old, true)
    }
    spark.catalog.refreshByPath(path)
    // memoized derivations over this path are now stale
    if (flagged.nonEmpty) graft.Memo.invalidate(spark, path)
    flagged.map(_.dir)
  }
}
