package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: the 100 TB answer to repeated fact⋈fact
  * joins on the same key. Writing both sides bucketed by the join key
  * (same bucket count) lets SortMergeJoin read co-located buckets with
  * NO exchange on either side — the shuffle is paid once at layout
  * time instead of per query.
  */
object BucketingOps {

  /** Write a table bucketed (and sorted) by `key` into the session
    * catalog/warehouse.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket key —
    * planner elides both exchanges (verified in BucketedJoinSpec).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
