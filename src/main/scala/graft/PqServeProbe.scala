package graft

import org.apache.spark.sql.functions._

/** Measurement tool (not an operator): per-stage cost of the D76e
  * `ann_graph_pq` serve — the r14 bench's slowest genuine sf0.1 query
  * (4.63 s isolated; r15 judge item #5 says measure before touching).
  * Stages timed in build order: shared warm, code adjacency, query
  * distance tables, each memoized ADC-walk hop frame, final exact
  * re-rank. Then an A/B on the hop-scoring kernel: `element_at` on a
  * 256-entry MAP column (a linear key scan per lookup in Spark's
  * ArrayBasedMapData) vs the same tables as dense position-indexed
  * ARRAYS (O(1) indexing) over the identical hop-3 expansion input.
  * Corpus via SPARK_GRAFT_SF_DIR (default sf0.1 — the bench fixture).
  */
object PqServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq-serve] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()

    time("warmShared")(operators.AnnOps.warmShared(spark, dir))
    val adjC = operators.AnnOps.graphAdjCodes(spark, dir)
    time("adjCodes build")(noop(adjC))
    val qd = operators.AnnOps.pqQueryTables(spark, dir)
    time("query dist tables")(noop(qd))
    val beams = operators.AnnOps.graphPqBeams(spark, dir)
    beams.zipWithIndex.foreach { case (b, h) =>
      time(s"hop $h beam")(noop(b))
    }
    time("serve warm (rerank only)")(
      noop(operators.AnnOps.annGraphPq(spark, dir)))
    time("serve again (all memoized)")(
      noop(operators.AnnOps.annGraphPq(spark, dir)))

    // ---- rerank decomposition (serve-again is 5+ s with every beam
    // frame memoized, so the cost is AFTER the walk) ----
    val bm3 = beams(operators.AnnOps.GraphHops)
    val shortlist = bm3.filter(col("c_id") =!= col("q_id"))
      .select("q_id", "c_id")
    time("rerank: shortlist count")(shortlist.count())
    val rr = operators.AnnOps.exactRerank(spark, dir, shortlist, 10)
    time("rerank: topk no-order")(noop(rr))
    time("rerank: + orderBy")(noop(rr.orderBy("q_id", "rnk")))
    time("rerank: topk again")(noop(
      operators.AnnOps.exactRerank(spark, dir, shortlist, 10)))

    spark.stop()
  }
}
