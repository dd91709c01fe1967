package graft

import org.apache.spark.sql.functions._

/** Measurement tool (not an operator): the ann_graph_pq_prod ×1
  * recall miss (0.765 at the widest swept (64,4); target 0.9) —
  * before changing the serving design, measure what closes it:
  *   (a) visited-set rerank: exact-rerank the UNION of every hop's
  *       beam (the DiskANN discipline: L > k, rerank all visited)
  *       instead of the final beam only;
  *   (b) plain beam widening (128 / 256) at the final-beam rerank.
  * Factors via args (default "1"), corpus via SPARK_GRAFT_SF_DIR.
  */
object PqVisitProbe {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1))
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sfName = base.replaceAll(".*/", "")
    factors.foreach { f =>
      val dir = s"/tmp/graft_scale/${sfName}_x$f"
      ScaleBench.amplify(spark, base, f, dir)
      Memo.clear(spark)
      val m = operators.AnnOps.DefaultM * f
      operators.AnnOps.warmShared(spark, dir)
      val queries = Tables.embeddings(spark, dir)
        .filter(col("vec_id") % f === 0 && (col("vec_id") / f) % 50 === 0)
        .select("vec_id", "embedding")
      val exact = operators.AnnOps.exactTopKFor(spark, dir, queries)
        .select("q_id", "c_id").persist()
      val nEx = exact.count().toDouble
      val adjC = operators.AnnOps.graphAdjCodesM(spark, dir, m).persist()
      adjC.count()
      val anchorsC = operators.AnnOps.graphAnchorCodes(spark, dir, m)
      def recallOf(got: org.apache.spark.sql.DataFrame): Double = {
        val r = got.select("q_id", "c_id")
          .join(exact, Seq("q_id", "c_id")).count() / nEx
        math.rint(r * 1000) / 1000
      }
      // (b) beam widening, final-beam rerank (the current serve)
      for (b <- Seq(64, 128, 256); h <- Seq(2, 3)) {
        val r = recallOf(operators.AnnOps.graphPqSearchOn(spark, dir,
          adjC, anchorsC, queries, hops = h, beam = b,
          excludeSelf = true))
        println(s"[pq-visit] x$f final-beam b${b}h$h recall@10 = $r")
      }
      // (a) visited-set rerank at (64, 3): union of the hop FINALS at
      // hops 0..3 approximates the visited-beam union (each walk's
      // final beam at depth h IS hop-h's beam)
      val qv = queries
        .withColumn("qv", graft.functions.VectorFns.toDouble(col("embedding")))
        .withColumn("qn", graft.functions.VectorFns.norm(col("qv")))
        .select(col("vec_id"), col("qv"), col("qn"))
      val qd = operators.AnnOps.pqDistTablesOf(spark, dir,
        qv.select(col("vec_id"), col("qv").as("v")))
      for (b <- Seq(64, 128)) {
        val beams = (0 to 3).map(h =>
          operators.AnnOps.graphPqWalk(qd, adjC, anchorsC, h, b,
            pinKey = s"$dir:pqVisitProbe$h").select("q_id", "c_id"))
        val visited = beams.reduce(_.unionByName(_)).distinct()
        val emb = Tables.embeddings(spark, dir)
          .withColumn("v", graft.functions.VectorFns.toDouble(col("embedding")))
          .withColumn("nrm", graft.functions.VectorFns.norm(col("v")))
          .select(col("vec_id").as("c_id"), col("v").as("cv"),
            col("nrm").as("cn"))
        val scored = emb.join(broadcast(visited), "c_id")
          .join(broadcast(qv.select(col("vec_id").as("q_id"),
            col("qv"), col("qn"))), "q_id")
          .filter(col("c_id") =!= col("q_id"))
          .withColumn("sim", graft.functions.VectorFns.cosine(
            col("qv"), col("cv"), col("qn"), col("cn")))
        val top = graft.plans.TopK.perKey(scored, Seq(col("q_id")),
          Seq(col("sim").desc, col("c_id").asc), 10)
        println(s"[pq-visit] x$f visited-union b${b}h0..3 recall@10 = " +
          s"${recallOf(top)}")
      }
      adjC.unpersist(); exact.unpersist()
      ()
    }
    spark.stop()
  }
}
