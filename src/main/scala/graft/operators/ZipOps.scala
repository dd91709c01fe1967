package graft.operators

import graft.Tables
import graft.functions.ZipFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** C7: zip expansion — synthesize an archive per `.zip`-routed
  * document (deterministic bytes), then explode it into per-entry
  * records exactly like the reference's uploadZipedFile loop
  * (handler/kafka.go:210-270): pack = archive name, name = entry path.
  *
  * Scale: explode is per-row (no shuffle); archive bytes never leave
  * the executor that read the row.
  */
object ZipOps {

  def zipExpand(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") % 4 === 2) // the `.zip`-extension route
      .withColumn("pack", concat(lit("d"), col("doc_id"), lit(".zip")))
      .withColumn("zip_bytes",
        ZipFns.zipCreate2Col(
          concat(lit("inner/d"), col("doc_id"), lit(".txt")), col("text")))
    docs
      .select(col("doc_id"), col("pack"),
        explode(ZipFns.zipEntriesCol(col("zip_bytes"))).as("entry"))
      .select(col("doc_id"), col("pack"),
        col("entry.name").as("name"),
        col("entry.size").cast(LongType).as("size"),
        md5(col("entry.content")).as("checksum"))
      .orderBy("doc_id", "name")
  }
}
