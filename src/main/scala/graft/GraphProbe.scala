package graft

import org.apache.spark.sql.functions._

/** One-shot debug harness for the graph prod regime: build the graph
  * at m = 16F on an amplified corpus and report, for a few fixed
  * queries, (a) whether the true top-10 (the amplifier twins) appear
  * as adjacency out-edges of the query node, (b) what the walk's beam
  * finds per hop, (c) where the walk first touches the query's
  * neighborhood.
  *
  * Usage: runMain graft.GraphProbe <ampDir> <F>
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val f = args(1).toInt
    val m = operators.AnnOps.DefaultM * f
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val adjV = operators.AnnOps.walkEdges(
      operators.AnnOps.graphAdjVM(spark, dir, m),
      operators.AnnOps.graphDownLinks(spark, dir, m)).persist()
    println(s"[probe] adjacency+down rows: ${adjV.count()}")
    val anchors = operators.AnnOps.graphAnchors(spark, dir, m)
    val queries = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % f === 0 && (col("vec_id") / f) % 50 === 0)
      .select("vec_id", "embedding")
    val exact = operators.AnnOps.exactTopKFor(spark, dir, queries).persist()
    val nEx = exact.count().toDouble
    // (a) edge containment: for each query, how many of its true
    // top-10 are its DIRECT out-edges?
    val qIds = queries.select(col("vec_id").as("q_id"))
    val direct = exact.join(
        adjV.select(col("src").as("q_id"), col("dst").as("c_id")),
        Seq("q_id", "c_id")).count()
    println(f"[probe] true-top10 present as DIRECT query out-edges: " +
      f"$direct/${nEx.toLong} (${direct / nEx}%.3f)")
    // (a2) reachability the other way: is the QUERY an out-edge target
    // of its true neighbors (can the walk hop from a found neighbor to
    // the rest)?
    val within = exact.join(
        adjV.select(col("dst").as("q_id"), col("src").as("c_id")),
        Seq("q_id", "c_id")).count()
    println(f"[probe] true-top10 with an edge INTO the query: " +
      f"$within/${nEx.toLong} (${within / nEx}%.3f)")
    // (b) per-hop recall of the walk
    for (b <- Seq(16, 32, 48, 64); h <- 1 to 4) {
      val got = operators.AnnOps.graphSearchOn(spark, dir, adjV, anchors,
          queries, hops = h, beam = b, excludeSelf = true)
        .select("q_id", "c_id")
      val r = got.join(exact, Seq("q_id", "c_id")).count() / nEx
      println(f"[probe] walk recall@10 beam=$b hops=$h: $r%.3f")
    }
    // (c) one query's story: its beam at the deepest hop vs its truth
    val q0 = queries.select(min(col("vec_id"))).collect()(0).getLong(0)
    val truth0 = exact.filter(col("q_id") === q0)
      .select("c_id").collect().map(_.getLong(0)).toSeq.sorted
    val beam0 = operators.AnnOps.graphSearchOn(spark, dir, adjV, anchors,
        queries.filter(col("vec_id") === q0), hops = 4,
        excludeSelf = true)
      .select("c_id").collect().map(_.getLong(0)).toSeq.sorted
    val edges0 = adjV.filter(col("src") === q0)
      .select("dst").collect().map(_.getLong(0)).toSeq.sorted
    println(s"[probe] q$q0 truth:  ${truth0.mkString(",")}")
    println(s"[probe] q$q0 result: ${beam0.mkString(",")}")
    println(s"[probe] q$q0 edges:  ${edges0.mkString(",")}")
    spark.stop()
  }
}
