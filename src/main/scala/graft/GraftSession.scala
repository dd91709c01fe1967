package graft

import org.apache.spark.sql.SparkSession

/** Tuned session builder for graft workloads.
  *
  * Knob reasoning (scaled for local[n] here; the same ratios hold on a
  * real cluster):
  *  - shuffle.partitions ≈ 2× total cores (locally just n) — the
  *    driver's 100 TB deployment would set ~2× executor-cores×executors.
  *  - AQE on: runtime coalescing, skew-join splitting, join re-plan.
  *  - files.maxPartitionBytes 128m: scan parallelism vs task overhead.
  *  - UTC session TZ: oracle/engine parity for all timestamp math.
  *  - GraftExtensions: TopKPerKey strategy + row_number-topk rewrite.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return a pre-existing session where the
    // extensions config never applied — register idempotently.
    plans.TopK.ensureRegistered(s)
    if (!s.experimental.extraOptimizations.contains(plans.TopKRewriteRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ plans.TopKRewriteRule
    plans.GraftExtensions.registerFunctions(s)
    s
  }
}
