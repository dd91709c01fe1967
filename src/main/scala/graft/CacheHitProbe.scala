package graft

import org.apache.spark.sql.functions._

/** Measurement tool: does a plan DERIVED from a persisted frame whose
  * plan contains custom nodes (TopKPerKey) / pinned-RDD scans get
  * rewritten to InMemoryRelation by the CacheManager? (PqServeProbe
  * showed shortlist.count() re-paying ~4.5 s on a just-materialized
  * memoized beam frame.)
  */
object CacheHitProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    operators.AnnOps.warmShared(spark, dir)
    val beams = operators.AnnOps.graphPqBeams(spark, dir)
    val bm3 = beams(operators.AnnOps.GraphHops)
    bm3.write.format("noop").mode("overwrite").save()
    def timed(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[cache-probe] $l%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("bm3.count (same instance)")(bm3.count())
    timed("bm3.count again")(bm3.count())
    // split driver-side plan work from execution: a fresh Dataset over
    // the same plan forces re-analysis/canonicalization/optimization
    val fresh = bm3.filter(lit(true))
    timed("fresh: analyzed")(fresh.queryExecution.analyzed)
    timed("fresh: withCachedData")(fresh.queryExecution.withCachedData)
    timed("fresh: optimizedPlan")(fresh.queryExecution.optimizedPlan)
    timed("fresh: executedPlan")(fresh.queryExecution.executedPlan)
    timed("fresh: rdd count")(fresh.queryExecution.toRdd.count())
    val derived = bm3.filter(col("c_id") =!= col("q_id")).select("q_id", "c_id")
    timed("derived.count")(derived.count())
    timed("fresh.count() action")(fresh.count())
    println("[cache-probe] bm3 optimized root: " +
      bm3.queryExecution.optimizedPlan.getClass.getSimpleName)
    println("[cache-probe] bm3 optimized plan:\n" +
      bm3.queryExecution.optimizedPlan.treeString.linesIterator
        .take(12).map(l => l.take(160)).mkString("\n"))
    // where do the 3 s go? count the broadcast exchanges re-executed
    // per action via a listener on job/stage wall
    val lst = new org.apache.spark.scheduler.SparkListener {
      @volatile var taskMs = 0L
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskMs += t.taskInfo.duration
      }
    }
    spark.sparkContext.addSparkListener(lst)
    timed("bm3.count 3rd")(bm3.count())
    spark.sparkContext.removeSparkListener(lst)
    println(s"[cache-probe] task time during 3rd count: ${lst.taskMs} ms")
    // hypothesis: the per-action cost is SparkListenerSQLExecutionStart's
    // physicalPlanDescription — rendering plan trees that embed the PQ
    // codebooks as giant literals. maxPlanStringLength caps the render.
    spark.conf.set("spark.sql.maxPlanStringLength", (1 << 20).toString)
    timed("bm3.count capped 1MB")(bm3.count())
    spark.conf.set("spark.sql.maxPlanStringLength", (64 << 10).toString)
    timed("bm3.count capped 64KB")(bm3.count())
    timed("bm3.count capped 64KB x2")(bm3.count())
    // stack-sample the driver during a count loop: run counts in a
    // worker thread, sample its stack every 50 ms, print the hottest
    // frames
    locally {
      @volatile var go = true
      val worker = new Thread(() => { while (go) bm3.count() })
      worker.setDaemon(true)
      worker.start()
      Thread.sleep(500)
      val hist = scala.collection.mutable.Map[String, Int]()
      for (_ <- 1 to 100) {
        val st = worker.getStackTrace
        // first non-wait frame chain signature (top 3 app frames)
        val sig = st.take(25).map(_.toString)
          .filterNot(f => f.startsWith("java.") || f.startsWith("jdk."))
          .take(3).mkString(" <- ")
        hist(sig) = hist.getOrElse(sig, 0) + 1
        Thread.sleep(50)
      }
      go = false
      hist.toSeq.sortBy(-_._2).take(10).foreach { case (s, n) =>
        println(s"[cache-probe] SAMPLES $n: $s")
      }
    }
    val hasIMR = derived.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }.nonEmpty
    println(s"[cache-probe] derived plan uses InMemoryRelation: $hasIMR")
    val hasIMRSelf = bm3.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }.nonEmpty
    println(s"[cache-probe] bm3 own plan uses InMemoryRelation: $hasIMRSelf")
    spark.stop()
  }
}
