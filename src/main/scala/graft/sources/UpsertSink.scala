package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed idempotent upsert writer — the Spark-native dual of the
  * reference's Cassandra insert-or-replace on the primary key
  * (cassandra.go:208-265: a later INSERT with the same
  * (file_date, file_time, folder, pack, name) replaces the row;
  * cassandra.go:330-350 declares that PK). Re-ingesting a batch — the
  * agent's replay-on-failure behavior — must leave the table with
  * exactly one, latest, record per key.
  *
  * MERGE shape at scale: the existing table is scoped to ONLY the
  * file_date partitions present in the batch (partition-pruned scan —
  * the unscoped table is never read), merged with last-write-wins per
  * PK on `versionCol` (Cassandra timestamp semantics), staged, and
  * swapped in via dynamic partition overwrite. Work is proportional
  * to the touched days, not the table; a day's partition rewrite is
  * what LeveledCompaction does for the same workload on the reference
  * side.
  */
object UpsertSink {

  /** cassandra.go:349 PRIMARY KEY (file_date, file_time, folder, pack, name) */
  val PrimaryKey: Seq[String] = Seq("file_date", "file_time", "folder", "pack", "name")

  /** Insert-or-replace `batch` into the date-partitioned parquet table
    * at `path`. Later `versionCol` wins per PK (ties are arbitrary,
    * like same-timestamp Cassandra writes); `file_date` must be a
    * batch column (becomes the partition key).
    */
  def upsert(batch: DataFrame, path: String,
      pk: Seq[String] = PrimaryKey, versionCol: String = "upload_time"): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // .get(0).toString, not getString: file_date may be STRING or DATE
    // typed; isin with strings casts correctly against either
    val touchedDays = batch.select("file_date").distinct().collect()
      .map(_.get(0).toString)
    val existing =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        Some(spark.read.parquet(path)
          .filter(col("file_date").isin(touchedDays.toSeq: _*)) // partition-pruned
          .select(batch.columns.map(col): _*))
      else None

    val all = existing.fold(batch)(batch.unionByName(_))
    val w = Window.partitionBy(pk.map(col): _*).orderBy(desc(versionCol))
    val merged = all
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    // Stage then swap: the merged plan reads `path`, which parquet
    // cannot overwrite in place. Only the touched-day rows are staged,
    // and the dynamic overwrite replaces exactly those partitions.
    // partitionOverwriteMode rides as a PER-WRITE option, so a
    // concurrent overwrite elsewhere in the session never silently
    // inherits dynamic semantics.
    val staging = new org.apache.hadoop.fs.Path(path + "_upsert_staging")
    try {
      merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
      spark.read.parquet(staging.toString)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("file_date").parquet(path)
      spark.catalog.refreshByPath(path)
      // memoized derivations over this path are now stale
      graft.Memo.invalidate(spark, path)
    } finally fs.delete(staging, true)
  }
}
