package graft

import org.apache.spark.sql.SparkSession

/** r15-opt measurement main: per-query warm/cold latency attribution.
  * Runs each query in SPARK_GRAFT_ONLY three times (noop sink) and
  * reports all three — run 1 carries first-run codegen/JIT, runs 2-3
  * are the warm repeatable latency the serial bench approximates
  * mid-suite. Comparing r2/r3 across code versions isolates plan/work
  * changes from JIT noise.
  */
object QProbe {
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
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q1_pricing_summary")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val parts = names.map { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      "\"" + n + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
    }
    val line = s"""{"probe":"q","runs":${parts.mkString("{", ",", "}")}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT",
        "/tmp/q_probe.json")), (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
