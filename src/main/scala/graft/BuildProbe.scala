package graft

import org.apache.spark.sql.functions._

/** Measurement tool (not an operator): decomposes the graph prod
  * BUILD row (`ann_graph_prod_build`, r13 verdict #4: exp_10_30 =
  * 1.08) into its stages per amplification factor — NN-descent
  * adjacency build vs the bucketed layout WRITE at growing m — so the
  * superlinear term is identified by measurement before anything is
  * "fixed" (the r13 lesson). Factors via args (default "10,30"),
  * corpus via SPARK_GRAFT_SF_DIR.
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10, 30))
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sfName = base.replaceAll(".*/", "")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    factors.foreach { f =>
      val dir = s"/tmp/graft_scale/${sfName}_x$f"
      ScaleBench.amplify(spark, base, f, dir)
      Memo.clear(spark)
      val m = operators.AnnOps.DefaultM * f
      // stage 0: the shared bases the prod block warms untimed
      val warmSec = time {
        operators.AnnOps.warmShared(spark, dir)
      }
      val table = sources.LayoutStore.tableName(s"probe_graph_m$m", dir)
      sources.LayoutStore.purge(spark, table)
      // stage 1: the NN-descent adjacency (memoized; count forces it)
      var adjV: org.apache.spark.sql.DataFrame = null
      val buildSec = time {
        adjV = operators.AnnOps.graphAdjVM(spark, dir, m)
        adjV.count()
        ()
      }
      // stage 2: the bucketed layout write alone
      val writeSec = time {
        sources.LayoutStore.ensure(spark, table, Seq("src"), m)(adjV)
      }
      val files = sources.LayoutStore.dataFileCount(spark, table)
      println(f"[build-probe] x$f m=$m: warm $warmSec%.1f s, " +
        f"adj build $buildSec%.1f s, bucketed write $writeSec%.1f s " +
        f"($files files)")
      sources.LayoutStore.purge(spark, table)
    }
    spark.stop()
  }
}
