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

  /** Sidecar carrying the table's declared schema — the parquet dual
    * of the reference's table metadata.
    */
  val SchemaFile = "_graft_schema.json"

  /** Table init/validation — the dual of cassandra.go:326-360
    * CheckCassandraTable, which creates the keyspace/table on first
    * deploy and implicitly pins the schema for every later write.
    * First run: persist the expected schema as a sidecar under the
    * table root. Re-deploys: validate the incoming batch against the
    * declared schema and FAIL LOUDLY on drift (a silently mixed-schema
    * parquet table is the analog of Cassandra rejecting a mismatched
    * INSERT, except it corrupts reads much later — so the check moves
    * to write time). Field order is not part of the contract
    * (columns-by-name, like CQL).
    */
  def ensureTable(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecar = new org.apache.hadoop.fs.Path(root, SchemaFile)
    if (!fs.exists(sidecar)) {
      fs.mkdirs(root)
      val out = fs.create(sidecar, true)
      try out.write(batch.schema.json.getBytes("UTF-8")) finally out.close()
    } else {
      val in = fs.open(sidecar)
      val declaredJson =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val arr = new Array[Byte](8192)
          var n = in.read(arr)
          while (n > 0) { buf.write(arr, 0, n); n = in.read(arr) }
          buf.toString("UTF-8")
        } finally in.close()
      val declared = org.apache.spark.sql.types.DataType.fromJson(declaredJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val d = declared.fields.map(f => f.name -> f.dataType).toMap
      val b = batch.schema.fields.map(f => f.name -> f.dataType).toMap
      if (d != b)
        throw new IllegalStateException(
          s"schema drift at $path: declared=${declared.simpleString} " +
            s"batch=${batch.schema.simpleString}")
    }
  }

  /** Insert-or-replace `batch` into the date-partitioned parquet table
    * at `path`. Later `versionCol` wins per PK (ties are arbitrary,
    * like same-timestamp Cassandra writes); `file_date` must be a
    * batch column (becomes the partition key).
    */
  def upsert(batch: DataFrame, path: String,
      pk: Seq[String] = PrimaryKey, versionCol: String = "upload_time"): Unit = {
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ensureTable(batch, path) // init or validate schema, CheckCassandraTable-style

    // .get(0).toString, not getString: file_date may be STRING or DATE
    // typed; isin with strings casts correctly against either
    val touchedDays = batch.select("file_date").distinct().collect()
      .map(_.get(0).toString)
    // "has data" = any non-hidden child; a freshly initialized table
    // root holds only the schema sidecar, which parquet cannot read
    val hasData = fs.exists(root) && fs.listStatus(root).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    val existing =
      if (hasData)
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
