package graft

import org.apache.spark.sql.functions._

/** Measurement tool (not an operator): decomposes the
  * `graph_upkeep_fold` shuffle bytes per stage at chosen factors —
  * written for the r14 forced-×30 audit finding (3.2 MB at ×10 →
  * 28.3 MB at ×30, exp 1.99) so the flipping stage is identified by
  * measurement. Reproduces the audit extension's scope (clear, warm,
  * replay ann_graph) then meters: pin, walk, fwd join, rev join,
  * marker, full fold.
  */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10, 30))
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sfName = base.replaceAll(".*/", "")
    val meter = new ShuffleMeter(spark)
    def stage(name: String, f: Int)(body: => Unit): Unit = {
      meter.reset()
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      val (w, _) = meter.read()
      println(f"[fold-probe] x$f $name: ${w / 1e6}%.2f MB shuffled " +
        f"($sec%.1f s)")
    }
    factors.foreach { f =>
      val dir = s"/tmp/graft_scale/${sfName}_x$f"
      ScaleBench.amplify(spark, base, f, dir)
      Memo.clear(spark)
      operators.AnnOps.warmShared(spark, dir)
      SparkEntry.queries("ann_graph")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val batch = ScaleBench.graphUpkeepBatch(spark, dir, f)
      val baseAdj = operators.AnnOps.graphAdjV(spark, dir)
      val down = operators.AnnOps.graphDownLinks(spark, dir)
      val anchors = operators.AnnOps.graphAnchors(spark, dir)
      val arr = batch
        .withColumn("qv", graft.functions.VectorFns.toDouble(col("embedding")))
        .withColumn("qn", graft.functions.VectorFns.norm(col("qv")))
        .select(col("vec_id"), col("qv"), col("qn"))
        .persist()
      println(s"[fold-probe] x$f batch rows: ${arr.count()}")
      stage("pin(base walk-edges)", f) {
        operators.AnnOps.standingPinned(spark, dir, "probeBase")(
          operators.AnnOps.walkEdges(baseAdj, down))
        ()
      }
      val edges = operators.AnnOps.standingPinned(spark, dir, "probeBase")(
        operators.AnnOps.walkEdges(baseAdj, down))
      var newOut: org.apache.spark.sql.DataFrame = null
      stage("walk", f) {
        newOut = operators.AnnOps.graphWalk(
          arr.select(col("vec_id").as("q_id"), col("qv"), col("qn")),
          edges, anchors, operators.AnnOps.GraphHops,
          operators.AnnOps.GraphBeam, operators.AnnOps.GraphK,
          excludeSelf = false, pinKey = s"$dir:probeFold").persist()
        newOut.count()
        ()
      }
      val emb = Tables.embeddings(spark, dir)
        .withColumn("v", graft.functions.VectorFns.toDouble(col("embedding")))
        .withColumn("nrm", graft.functions.VectorFns.norm(col("v")))
        .select("vec_id", "v", "nrm")
      var fwd: org.apache.spark.sql.DataFrame = null
      stage("fwd join (corpus vectors)", f) {
        fwd = newOut.select(col("q_id").as("src"), col("c_id").as("dst"),
            col("sim"))
          .join(emb.select(col("vec_id").as("dst"), col("v").as("dv"),
            col("nrm").as("dn")), "dst")
          .withColumn("fwd", lit(true)).persist()
        fwd.count()
        ()
      }
      stage("rev join (arrival vectors)", f) {
        newOut.select(col("c_id").as("src"), col("q_id").as("dst"),
            col("sim"))
          .join(arr.select(col("vec_id").as("dst"), col("qv").as("dv"),
            col("qn").as("dn")), "dst")
          .withColumn("fwd", lit(false))
          .write.format("noop").mode("overwrite").save()
      }
      stage("marker agg", f) {
        arr.join(fwd.groupBy(col("src")).agg(count(lit(1)).as("nf")),
            arr("vec_id") === col("src"), "left")
          .select(col("vec_id").as("src"), col("vec_id").as("dst"),
            coalesce(col("nf"), lit(0L)).cast("double").as("sim"))
          .write.format("noop").mode("overwrite").save()
      }
      stage("full graphUpkeepEdges", f) {
        operators.AnnOps.graphUpkeepEdges(spark, dir, baseAdj, down,
            anchors, batch, standingKey = "probeBase2")
          .write.format("noop").mode("overwrite").save()
      }
      fwd.unpersist(); newOut.unpersist(); arr.unpersist()
      ()
    }
    spark.stop()
  }
}
