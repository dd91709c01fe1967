package graft

import org.apache.spark.sql.SparkSession

/** r15-opt measurement main: attribute the serving_config build's wall
  * (77 s of the 120 s layout cold build, WarmupProbe) across the
  * recall curve's constituents by forcing each public serve face in
  * the curve's own order before the curve itself — the residue left
  * in the final annRecall timing is the sims-cache + fan-out cost no
  * public face owns.
  */
object TunerProbe {
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
    import operators.AnnOps

    val out = new scala.collection.mutable.ArrayBuffer[(String, Double)]()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      out += name -> (System.nanoTime() - t0) / 1e9
      r
    }

    time("warmShared")(AnnOps.warmShared(spark, sfDir))
    time("exact_baseline")(noop(AnnOps.annCosineTopK(spark, sfDir)))
    time("graph_beams")(noop(AnnOps.annGraph(spark, sfDir)))
    AnnOps.RecallGraphHops.foreach { h =>
      time(s"graph_pq_h$h")(noop(AnnOps.annGraphPq(spark, sfDir, hops = h)))
    }
    AnnOps.RecallResAdcSubs.foreach { ns =>
      time(s"res_adc_n$ns")(noop(
        AnnOps.annIvfPqRes(spark, sfDir, r = 10, k = 10, nSub = ns)))
    }
    time("sq8_adc")(noop(AnnOps.annSq8Adc(spark, sfDir, 10)))
    time("sq8_rerank")(noop(AnnOps.annSq8Rerank(spark, sfDir)))
    time("curve_residue")(noop(AnnOps.annRecall(spark, sfDir)))
    time("tuner")(noop(AnnOps.annProbeTuner(spark, sfDir)))

    val total = out.map(_._2).sum
    val js = out
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val line = s"""{"probe":"tuner","total":$total,"items":$js,"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT",
        "/tmp/tuner_probe.json")), (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
