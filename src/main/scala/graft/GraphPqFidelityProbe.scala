package graft

import org.apache.spark.sql.functions._

/** Measurement tool (not an operator): WHY does the ×1 graph_pq serve
  * need (beam 128, hops 3) for 0.90 recall while ×10/×30 reach
  * 0.925/0.975 at (32, 2)? (r15 judge item #3.) The float walk on the
  * SAME graph/anchors reaches 0.96 at ×1 (graph_prod_tune b64h3), so
  * navigation coverage is not the gap — this probe isolates ADC LEG
  * FIDELITY: brute-force ADC top-B recall of the true top-10, the
  * walk-independent upper bound on any B-beam final-rerank serve
  * (the rerank can only surface what the ADC-ranked beam contains).
  * Also reports the quantization-error-to-neighbor-gap ratio that
  * explains WHERE the bound comes from: if per-vector quantization
  * error rivals the distance gap between the 10th and B-th true
  * neighbor, codes cannot order the boundary.
  */
object GraphPqFidelityProbe {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 10))
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sfName = base.replaceAll(".*/", "")
    factors.foreach { f =>
      val dir = s"/tmp/graft_scale/${sfName}_x$f"
      ScaleBench.amplify(spark, base, f, dir)
      Memo.clear(spark)
      // the prod query set: the base corpus's 100 fixed queries
      val queries = Tables.embeddings(spark, dir)
        .filter(col("vec_id") % f === 0 && (col("vec_id") / f) % 50 === 0)
        .select("vec_id", "embedding")
      val exact = operators.AnnOps.exactTopKFor(spark, dir, queries)
        .select("q_id", "c_id").persist()
      val nEx = exact.count().toDouble
      // brute ADC top-B over the PROD-GEOMETRY codes (same book the
      // serve navigates on): the query set above, not dir's %50 set
      val adcAll = operators.AnnOps.pqAdcFor(spark, dir, queries).persist()
      adcAll.count()
      for (b <- Seq(32, 48, 64, 128, 256)) {
        val topB = plans.TopK.perKey(adcAll, Seq(col("q_id")),
          Seq(col("adc").asc, col("c_id").asc), b).select("q_id", "c_id")
        val r = topB.join(exact, Seq("q_id", "c_id")).count() / nEx
        println(f"[pq-fidelity] x$f brute-ADC top-$b recall@10 = $r%.3f")
      }
      // quantization error vs true-neighbor distance gap: mean code
      // err (‖v − reconstruction‖², the pqCodesCore err column) vs the
      // mean exact-L2 spread between the 10th and 48th neighbor
      val err = operators.AnnOps.pqCodeErr(spark, dir)
        .agg(avg("err")).head.getDouble(0)
      val gaps = operators.AnnOps.exactTopKSims(spark, dir, queries, k = 48)
        .groupBy("q_id")
        .agg(max(when(col("rnk") === 10, col("sim"))).as("s10"),
          max(when(col("rnk") === 48, col("sim"))).as("s48"))
        .agg(avg(col("s10") - col("s48"))).head.getDouble(0)
      println(f"[pq-fidelity] x$f mean code err = $err%.4f, " +
        f"mean sim gap rank10->rank48 = $gaps%.4f")
      // what-if: 16-subspace navigation book (same seeding + Lloyd)
      val adc16 = operators.AnnOps.pqAdcNFor(spark, dir, queries, 16)
        .persist()
      adc16.count()
      for (b <- Seq(32, 48, 64, 128)) {
        val topB = plans.TopK.perKey(adc16, Seq(col("q_id")),
          Seq(col("adc").asc, col("c_id").asc), b).select("q_id", "c_id")
        val r = topB.join(exact, Seq("q_id", "c_id")).count() / nEx
        println(f"[pq-fidelity] x$f 16-sub brute-ADC top-$b recall@10 = $r%.3f")
      }
      adc16.unpersist()
      adcAll.unpersist(); exact.unpersist()
      ()
    }
    spark.stop()
  }
}
