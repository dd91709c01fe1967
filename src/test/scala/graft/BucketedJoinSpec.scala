package graft

import graft.operators.BucketingOps
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends GraftSpec {

  test("identically-bucketed tables join without exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BucketingOps.writeBucketed(
        Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity"),
        "li_bucketed", "l_orderkey", 8)
      BucketingOps.writeBucketed(
        Tables.orders(spark, Sf).select("o_orderkey", "o_totalprice"),
        "ord_bucketed", "o_orderkey", 8)

      val joined = BucketingOps.colocatedJoin(spark,
        "li_bucketed", "ord_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // correctness: equals the plain join
      val expected = Tables.lineitem(spark, Sf)
        .join(Tables.orders(spark, Sf),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
