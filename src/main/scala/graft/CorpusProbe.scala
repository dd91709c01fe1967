package graft

import org.apache.spark.sql.SparkSession

/** r15-opt measurement main: attribute corpus_build_incremental's
  * first-run (in-suite) cost — 8.9 s in-suite vs 2.5 s warm isolated
  * in the r15 bench. Times warmStanding, the stage A-C survivor fold
  * (which materializes the incPin frames), the stage D-E assembly,
  * then two warm re-runs.
  */
object CorpusProbe {
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

    val out = new scala.collection.mutable.ArrayBuffer[(String, Double)]()
    def time[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      out += name -> (System.nanoTime() - t0) / 1e9
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("q1_warm")(noop(SparkEntry.queries("q1_pricing_summary")(spark, sfDir)))
    time("warmStanding")(operators.CurationOps.warmStanding(spark, sfDir))
    time("survivor_fold_AC") {
      val (su, _, _, _) = operators.CurationOps.incrementalSurvivors(spark, sfDir)
      noop(su)
    }
    time("assembly_DE")(noop(
      operators.CurationOps.corpusBuildIncremental(spark, sfDir)))
    time("warm_rerun1")(noop(
      operators.CurationOps.corpusBuildIncremental(spark, sfDir)))
    time("warm_rerun2")(noop(
      operators.CurationOps.corpusBuildIncremental(spark, sfDir)))

    val js = out.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"probe":"corpus","items":$js,"sf":"$sfDir"}""")
    spark.stop()
  }
}
