package graft

import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
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

  /** The production join shape's two sides (the exact aliasing
    * ngramPairs / the incremental delta join use — one definition, so
    * the pinned plan cannot drift from the operator's join).
    */
  private def sideA(df: DataFrame): DataFrame =
    df.select(col("lang").as("l_a"), col("shingle").as("sh_a"),
      col("doc_id").as("a_id"))
  private def sideB(df: DataFrame): DataFrame =
    df.select(col("lang").as("l_b"), col("shingle").as("sh_b"),
      col("doc_id").as("b_id"))
  private def blockedJoin(a: DataFrame, b: DataFrame,
      idCond: org.apache.spark.sql.Column): DataFrame =
    a.join(b, col("l_a") === col("l_b") &&
      col("sh_a") === col("sh_b") && idCond)

  private def withBroadcastDisabled[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def inputShuffles(df: DataFrame): Int = {
    val plan = unwrap(df.queryExecution.executedPlan)
    val smj = plan.collect { case s: SortMergeJoinExec => s }
    assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
    smj.head.collect { case e: ShuffleExchangeExec => e }.size
  }

  test("ngram self-join reuses the cached (lang, shingle) clustering — no input shuffle") {
    withBroadcastDisabled {
      val ex = DedupOps.shinglesByKey(spark, Sf)
      ex.count() // materialize the single build exchange
      val j = blockedJoin(sideA(ex), sideB(ex), col("a_id") < col("b_id"))
      assert(inputShuffles(j) == 0,
        "self-join re-shuffles the cached shingle table")
      // the join still answers: same pair count as a from-scratch join
      // over the unpartitioned exploded frame
      val raw = DedupOps.shingleExploded(spark, Sf)
      val j2 = blockedJoin(sideA(raw), sideB(raw), col("a_id") < col("b_id"))
      assert(j.count() == j2.count())
    }
  }

  test("incremental delta-edge join shuffles only the delta side") {
    withBroadcastDisabled {
      val ex = DedupOps.shinglesByKey(spark, Sf)
      ex.count()
      val delta = DedupOps.shingleExploded(spark, Sf)
        .filter(col("doc_id") % 10 === 7)
      val j = blockedJoin(sideA(delta), sideB(ex),
        col("a_id") =!= col("b_id"))
      assert(inputShuffles(j) == 1,
        "expected exactly the delta-side exchange")
    }
  }
}
