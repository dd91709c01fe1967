package graft

import org.apache.spark.sql.SparkSession

/** r15-opt measurement main: per-query split of WARM latency into
  * driver plan construction/optimization (analyzed -> executedPlan)
  * vs job execution (noop action on the pre-planned frame). Each
  * query is built+planned+run twice; the second split is reported
  * (first warms codegen). Tells whether a query's serial-bench cost
  * is Catalyst or stages.
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.maxPlanStringLength", (64 << 10).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // match the bench's warm state for layout/shared-cache consumers
    operators.LayoutOps.ensureAll(spark, sfDir)
    Par.run(spark, Seq(
      () => operators.DedupOps.warmShared(spark, sfDir),
      () => operators.AnnOps.warmShared(spark, sfDir),
      () => operators.DedupOps.warmTruth(spark, sfDir),
      () => operators.AnnOps.annRecall(spark, sfDir)
        .write.format("noop").mode("overwrite").save(),
      () => operators.CurationOps.warmStanding(spark, sfDir)))

    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q1_pricing_summary")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val parts = names.map { n =>
      val fn = SparkEntry.queries(n)
      var plan = 0.0; var exec = 0.0
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        plan = (t1 - t0) / 1e9; exec = (t2 - t1) / 1e9
      }
      f""""$n":{"plan":$plan%.3f,"exec":$exec%.3f}"""
    }
    println(s"""{"probe":"plancost","runs":${parts.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
