package graft.operators

import graft.Tables
import graft.functions.VectorFns
import graft.plans.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** D9–D11: similarity search over the embeddings table.
  *
  * Brute-force cosine is the exact baseline (and oracle); the LSH
  * variant is the 100 TB path: queries only meet candidates sharing a
  * hyperplane bucket, so compare volume scales with bucket occupancy
  * rather than the corpus. The query side is broadcast (queries ≪
  * corpus); the corpus never shuffles at all.
  */
object AnnOps {

  /** Persisted: norm/double-cast derived once post-exchange, and the
    * query/candidate self-reads share the cached rows.
    */
  private def embDouble(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("v", VectorFns.toDouble(col("embedding")))
      .withColumn("nrm", VectorFns.norm(col("v")))
      .select("vec_id", "label", "v", "nrm")
      .persist()

  /** D9: brute-force cosine top-10 for query vectors (vec_id % 50 = 0). */
  def annCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = emb.select(col("vec_id").as("c_id"), col("v").as("cv"),
      col("nrm").as("cn"))
    val sims = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("sim",
        VectorFns.cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    // custom TopKPerKey exec: per-key bounded heaps, shuffles only the
    // per-partition survivors instead of window-sorting all candidates
    TopK.perKey(sims, Seq(col("q_id")),
        Seq(col("sim").desc, col("c_id").asc), 10)
      .select("q_id", "c_id", "sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** D10: LSH-bucketed ANN with multi-probe — candidates come from the
    * query's 4-plane bucket plus its four Hamming-1 neighbor buckets
    * (flipping the least-confident plane signs is the standard
    * multi-probe trick; here all single flips — 5 probes of 16 cells).
    * The IVF-style scale path: probe count trades recall for compute
    * without touching the corpus layout. Recall vs D9 measured in tests.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
      .withColumn("bucket", VectorFns.hyperplaneBucket(col("v"), 4))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(array(col("bucket"), col("bucket").bitwiseXOR(1),
          col("bucket").bitwiseXOR(2), col("bucket").bitwiseXOR(4),
          col("bucket").bitwiseXOR(8))).as("probe"))
    val c = emb.select(col("vec_id").as("c_id"), col("v").as("cv"),
      col("nrm").as("cn"), col("bucket").as("c_bucket"))
    val sims = c.join(broadcast(q),
        col("probe") === col("c_bucket") && col("q_id") =!= col("c_id"))
      .withColumn("sim",
        VectorFns.cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    TopK.perKey(sims, Seq(col("q_id")),
        Seq(col("sim").desc, col("c_id").asc), 10)
      .select("q_id", "c_id", "sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** Nearest centroid(s) per vector by cosine: broadcast the (small)
    * centroid table, bounded-heap TopKPerKey instead of a window sort.
    */
  private def assign(vecs: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val sims = vecs.join(broadcast(centroids))
      .withColumn("csim",
        VectorFns.cosine(col("v"), col("cv"), col("nrm"), col("cnrm")))
    TopK.perKey(sims, Seq(col("vec_id")),
        Seq(col("csim").desc, col("cid").asc), nprobe)
      .select("vec_id", "cid")
  }

  /** D10b: IVF-Flat ANN — the other classic scale path next to LSH.
    * A deterministic k-means coarse quantizer (first-m seed + 1 Lloyd
    * round, all DataFrame aggregation) partitions the corpus into m
    * inverted lists; a query scans only its `nprobe` nearest lists.
    * Compare volume ≈ nprobe/m of brute force, and on a cluster the
    * inverted lists are the partitioning — each probe is a co-located
    * scan, the corpus never shuffles at query time.
    *
    * NOTE: at toy scale (≤ ~10k vectors) the quantizer's Lloyd rounds
    * cost more than they save and brute force benches faster — the
    * inverted-list payoff needs corpus ≫ m × probe work. Don't judge
    * it at sf0.1.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val m = 16
    // deterministic seed: the m lowest vec_ids (cid = seed vec_id —
    // stable, no partition-dependent id generation)
    var centroids = emb.orderBy("vec_id").limit(m)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    // Lloyd refinement: assign → element-wise mean per centroid
    for (_ <- 1 to 1) {
      val assigned = assign(emb, centroids, 1)
      centroids = assigned.join(emb, "vec_id")
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("x"))
        .groupBy("cid").agg(
          array_sort(collect_list(struct(col("pos"), col("x")))).as("pv"))
        .select(col("cid"), expr("transform(pv, p -> p.x)").as("cv"))
        .withColumn("cnrm", VectorFns.norm(col("cv")))
        .persist()
    }
    val lists = assign(emb, centroids, 1)
      .join(emb, "vec_id")
      .select(col("cid").as("c_cid"), col("vec_id").as("c_id"),
        col("v").as("cv2"), col("nrm").as("cn"))
    val probes = assign(emb.filter(col("vec_id") % 50 === 0), centroids, 4)
      .join(emb, "vec_id")
      .select(col("cid").as("q_cid"), col("vec_id").as("q_id"),
        col("v").as("qv"), col("nrm").as("qn"))
    val sims = lists.join(broadcast(probes),
        col("q_cid") === col("c_cid") && col("q_id") =!= col("c_id"))
      .withColumn("sim",
        VectorFns.cosine(col("qv"), col("cv2"), col("qn"), col("cn")))
    TopK.perKey(sims, Seq(col("q_id")),
        Seq(col("sim").desc, col("c_id").asc), 10)
      .select("q_id", "c_id", "sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** D11: per-label embedding stats (exact: count/min/max of norms —
    * no FP-order-dependent aggregates, so safe at any parallelism).
    */
  def embLabelStats(spark: SparkSession, dir: String): DataFrame =
    embDouble(spark, dir)
      .groupBy(col("label"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
      .orderBy("label")
}
