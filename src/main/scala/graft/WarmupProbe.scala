package graft

import org.apache.spark.sql.SparkSession

/** r15-opt measurement main: per-item timing of everything Bench's
  * warm-up pays (q1 codegen warm, every layout family's cold build,
  * the shared-derivation warms) — the attribution needed before
  * touching the 120 s cold-build wall (guide §1: measure first).
  * Prints one JSON line; order matches Bench's warm-up exactly so
  * each figure includes the same memo state the bench run would have.
  */
object WarmupProbe {
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

    time("q1_warm") {
      SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    operators.LayoutOps.purgeAll(spark, sfDir)
    // SPARK_GRAFT_PROBE_SEQ=1: per-family sequential attribution (the
    // r15 baseline measurement); default: time the production-shaped
    // parallel ensureAll as one item.
    if (sys.env.get("SPARK_GRAFT_PROBE_SEQ").contains("1"))
      operators.LayoutOps.families.foreach { f =>
        time(s"fam:${f.name}") { operators.LayoutOps.ensure(spark, sfDir, f.name) }
      }
    else time("ensureAll") { operators.LayoutOps.ensureAll(spark, sfDir) }
    time("warm_blocks_concurrent") {
      Par.run(spark, Seq(
        () => operators.DedupOps.warmShared(spark, sfDir),
        () => operators.AnnOps.warmShared(spark, sfDir),
        () => operators.DedupOps.warmTruth(spark, sfDir),
        () => operators.AnnOps.annRecall(spark, sfDir)
          .write.format("noop").mode("overwrite").save(),
        () => operators.CurationOps.warmStanding(spark, sfDir)))
    }

    val total = out.map(_._2).sum
    val js = out.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val line = s"""{"probe":"warmup","total":$total,"items":$js,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "/tmp/warmup_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
