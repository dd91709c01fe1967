package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends GraftSpec {

  test("TopKPerKey matches window row_number exactly") {
    val ev = Tables.events(spark, Sf)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val expected = ev
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("user_id", "event_id", "value", "rnk")
    val got = TopK.perKey(ev,
        Seq(col("user_id")), Seq(col("value").desc, col("event_id").asc), 5)
      .select("user_id", "event_id", "value", "rnk")
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("TopKPerKey handles keys with fewer than k rows") {
    val ev = Tables.events(spark, Sf).filter(col("event_id") < 30)
    val got = TopK.perKey(ev, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id").asc), 1000)
    assert(got.count() == ev.count())
  }

  test("TopKPerKey plan contains the custom exec pair") {
    val ev = Tables.events(spark, Sf)
    val got = TopK.perKey(ev, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id").asc), 3)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyExec") || plan.contains("TopKPerKey"))
    assert(plan.contains("PartialTopKPerKey"))
  }
}
