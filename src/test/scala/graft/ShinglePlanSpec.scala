package graft

import graft.operators.DedupOps
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** The shinglesByKey contract: one cached (lang, shingle) exchange
  * serves every consumer — the ngram self-join must plan with ZERO
  * shuffles on its inputs (broadcast disabled so the SMJ shape is
  * forced, as it would be at scale). InMemoryTableScan is a physical
  * LEAF, so collecting exchanges under the join node sees exactly the
  * join's own input shuffles and not the cache's build plan.
  */
class ShinglePlanSpec extends GraftSpec {

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  test("ngram self-join reuses the cached (lang, shingle) clustering — no input shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ex = DedupOps.shinglesByKey(spark, Sf)
      ex.count() // materialize the single build exchange
      val a = ex.select(col("lang").as("l_a"), col("shingle").as("sh_a"),
        col("doc_id").as("a_id"))
      val b = ex.select(col("lang").as("l_b"), col("shingle").as("sh_b"),
        col("doc_id").as("b_id"))
      val j = a.join(b, col("l_a") === col("l_b") &&
        col("sh_a") === col("sh_b") && col("a_id") < col("b_id"))
      val plan = unwrap(j.queryExecution.executedPlan)
      val smj = plan.collect { case s: SortMergeJoinExec => s }
      assert(smj.nonEmpty, s"expected a sort-merge self-join:\n$plan")
      val shuffles = smj.head.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"self-join re-shuffles the cached shingle table:\n$plan")
      // the join still answers: same pair count as a from-scratch join
      // over the unpartitioned exploded frame
      val raw = DedupOps.shingleExploded(spark, Sf)
      val a2 = raw.select(col("lang").as("l_a"), col("shingle").as("sh_a"),
        col("doc_id").as("a_id"))
      val b2 = raw.select(col("lang").as("l_b"), col("shingle").as("sh_b"),
        col("doc_id").as("b_id"))
      val j2 = a2.join(b2, col("l_a") === col("l_b") &&
        col("sh_a") === col("sh_b") && col("a_id") < col("b_id"))
      assert(j.count() == j2.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incremental delta-edge join shuffles only the delta side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ex = DedupOps.shinglesByKey(spark, Sf)
      ex.count()
      val exD = DedupOps.shingleExploded(spark, Sf)
        .filter(col("doc_id") % 10 === 7)
        .select(col("lang").as("l_a"), col("shingle").as("sh_a"),
          col("doc_id").as("a_id"))
      val exU = ex.select(col("lang").as("l_b"), col("shingle").as("sh_b"),
        col("doc_id").as("b_id"))
      val j = exD.join(exU, col("l_a") === col("l_b") &&
        col("sh_a") === col("sh_b") && col("a_id") =!= col("b_id"))
      val plan = unwrap(j.queryExecution.executedPlan)
      val smj = plan.collect { case s: SortMergeJoinExec => s }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
      // exactly ONE input shuffle (the delta side); the union side
      // rides its cached clustering
      val shuffles = smj.head.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 1,
        s"expected exactly the delta-side exchange, got ${shuffles.size}:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
