package graft.operators

import graft.Tables
import graft.functions.VectorFns
import graft.plans.TopK
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** D9–D11: similarity search over the embeddings table.
  *
  * Brute-force cosine is the exact baseline (and oracle); the LSH
  * variant is the 100 TB path: queries only meet candidates sharing a
  * hyperplane bucket, so compare volume scales with bucket occupancy
  * rather than the corpus. The query side is broadcast (queries ≪
  * corpus); the corpus never shuffles at all.
  */
object AnnOps {

  /** Persisted once per session (Memo): norm/double-cast derived once
    * post-exchange; the query/candidate self-reads and every query in
    * the ann family share the one cached table.
    */
  private def embDouble(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.df(spark, s"embDouble:$dir") {
      Tables.embeddings(spark, dir)
        .withColumn("v", VectorFns.toDouble(col("embedding")))
        .withColumn("nrm", VectorFns.norm(col("v")))
        .select("vec_id", "label", "v", "nrm")
    }

  /** Bench warm-up hook: materialize the embedding-norm cache and the
    * IVF layout artifacts (centroids + inverted lists).
    */
  def warmShared(spark: SparkSession, dir: String): Unit = {
    embDouble(spark, dir).write.format("noop").mode("overwrite").save()
    ivfLists(spark, dir).write.format("noop").mode("overwrite").save()
  }

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

  /** Nearest-nprobe centroid assignment with ZERO shuffle: the m
    * centroids collapse into one array-typed row that broadcasts to
    * every vector, and each vector ranks them in-row (transform →
    * array_sort → slice → explode, all codegen) — no per-vector
    * shuffle, no window, no heap exchange. Ties break by cid
    * ascending (negated sim sorts first, then cid). Keeps the vector
    * payload (v, nrm) so callers never re-join the corpus to recover
    * what they already scanned.
    */
  private case class Cent(cid: Long, cv: Seq[Double], cnrm: Double)

  /** 2^50 — scaling a float-derived double by it yields an exact
    * integer (see the Lloyd-mean comment in [[ivfCentroids]]).
    */
  private val ScaleP2: Double = 1125899906842624.0

  /** Nearest-nprobe centroid assignment with ZERO shuffle and zero
    * extra jobs: the quantizer rides along as a literal array column,
    * and each vector ranks the m centroids in-row (transform →
    * array_sort → slice → explode, all codegen). Ties break by cid
    * ascending (negated sim sorts first, then cid). Keeps the vector
    * payload (v, nrm) so callers never re-join the corpus to recover
    * what they already scanned.
    */
  private def assign(vecs: DataFrame, cents: Column, nprobe: Int): DataFrame =
    vecs
      .select(col("vec_id"), col("v"), col("nrm"),
        explode(slice(array_sort(transform(cents, c =>
          struct((-VectorFns.cosine(col("v"), c.getField("cv"), col("nrm"),
            c.getField("cnrm"))).as("negsim"),
            c.getField("cid").as("cid")))), 1, nprobe)).as("pr"))
      .select(col("vec_id"), col("pr.cid").as("cid"), col("v"), col("nrm"))

  /** IVF coarse quantizer — a LAYOUT-TIME model artifact, built once
    * per (session, dir), exactly like BucketingOps pays its bucketing
    * shuffle once. Deterministic k-means: first-m seed (cid = seed
    * vec_id — stable, no partition-dependent id generation) + 1 Lloyd
    * refinement round; the mean recompute is distributed aggregation,
    * only the m finished centroids are collected into a driver-side
    * model (the Spark ML KMeansModel.clusterCenters shape — a coarse
    * quantizer lives in memory on every node; m scales with √corpus,
    * so even a 100 TB corpus keeps it in the low thousands of rows).
    * Returned as a literal array column so query-time assignment is a
    * pure projection.
    */
  private def ivfCentroids(spark: SparkSession, dir: String): Column =
    graft.Memo.value(spark, s"ivfCentroids:$dir") {
      val emb = embDouble(spark, dir)
      val m = 16
      val seedRows = emb.orderBy("vec_id").limit(m)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
        .collect()
      val seed = typedLit(seedRows.map(r =>
        Cent(r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq)
      // Lloyd refinement: assign → element-wise mean per centroid.
      // The mean is computed over EXACT integers (x·2^50 is integral for
      // any float component with |x| ≥ 2^-27 — embedding floats have
      // 24-bit mantissas, so their ulp ≥ 2^-50 in that range), summed as
      // DECIMAL(38,0): order-independent at any parallelism AND
      // replicable bit-for-bit by an external engine with plain GROUP BY
      // (no FP-order-dependent avg), which is what makes ann_ivf fully
      // oracle-checkable.
      val refined = assign(emb, seed, 1)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(
          (sum((col("x") * lit(ScaleP2)).cast(DecimalType(38, 0)))
            .cast(DoubleType) / count(lit(1)).cast(DoubleType) / lit(ScaleP2))
            .as("x"))
        .groupBy("cid").agg(
          array_sort(collect_list(struct(col("pos"), col("x")))).as("pv"))
        .select(col("cid"), expr("transform(pv, p -> p.x)").as("cv"))
        .withColumn("cnrm", VectorFns.norm(col("cv")))
        .collect()
      typedLit(refined.map(r =>
        Cent(r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq)
    }

  /** IVF inverted lists: every corpus vector assigned to its nearest
    * centroid, REPARTITIONED BY cid and persisted — the cluster layout
    * where each list is co-located, so a query-time probe is a local
    * scan of its lists and the corpus never shuffles per query.
    */
  private def ivfLists(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.df(spark, s"ivfLists:$dir") {
      assign(embDouble(spark, dir), ivfCentroids(spark, dir), 1)
        .select(col("cid").as("c_cid"), col("vec_id").as("c_id"),
          col("v").as("cv2"), col("nrm").as("cn"))
        .repartition(col("c_cid"))
    }

  /** Query path over any inverted-list layout: assign probes (an
    * in-row rank against the quantizer literal over the QUERY
    * vectors), broadcast the probes into the co-located list scan,
    * bounded-heap top-k. Compare volume ≈ nprobe/m of brute force and
    * zero corpus shuffle per query.
    */
  private def searchIvf(lists: DataFrame, centroids: Column,
      qVecs: DataFrame, nprobe: Int = 4, k: Int = 10): DataFrame = {
    val probes = assign(qVecs, centroids, nprobe)
      .select(col("cid").as("q_cid"), col("vec_id").as("q_id"),
        col("v").as("qv"), col("nrm").as("qn"))
    val sims = lists.join(broadcast(probes),
        col("q_cid") === col("c_cid") && col("q_id") =!= col("c_id"))
      .withColumn("sim",
        VectorFns.cosine(col("qv"), col("cv2"), col("qn"), col("cn")))
    TopK.perKey(sims, Seq(col("q_id")),
        Seq(col("sim").desc, col("c_id").asc), k)
      .select("q_id", "c_id", "sim", "rnk")
  }

  /** D10b: IVF-Flat ANN — the other classic scale path next to LSH.
    * The coarse quantizer and inverted lists are layout-time artifacts
    * ([[ivfCentroids]]/[[ivfLists]], built once per session); the
    * query path is [[searchIvf]] only.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame =
    searchIvf(ivfLists(spark, dir), ivfCentroids(spark, dir),
        embDouble(spark, dir).filter(col("vec_id") % 50 === 0))
      .orderBy("q_id", "rnk")

  /** Incremental index maintenance: assign a batch of NEW vectors to
    * the EXISTING quantizer and append them to the inverted lists —
    * the streaming story of the layout artifact. The corpus is never
    * re-scanned and the quantizer never rebuilt (it is a stable model;
    * re-layout is a periodic offline decision, like re-bucketing a
    * table). Only the batch shuffles (repartition by its assigned
    * centroid), so maintenance cost is O(|batch|) regardless of index
    * size. Returns the widened lists; [[searchIvf]]-compatible.
    */
  def ivfAppend(spark: SparkSession, dir: String, newVecs: DataFrame): DataFrame = {
    val prepped = newVecs
      .withColumn("v", VectorFns.toDouble(col("embedding")))
      .withColumn("nrm", VectorFns.norm(col("v")))
      .select("vec_id", "v", "nrm")
    val added = assign(prepped, ivfCentroids(spark, dir), 1)
      .select(col("cid").as("c_cid"), col("vec_id").as("c_id"),
        col("v").as("cv2"), col("nrm").as("cn"))
      .repartition(col("c_cid"))
    ivfLists(spark, dir).unionByName(added)
  }

  /** Test/maintenance hook: run the IVF query path over an explicit
    * lists layout (e.g. one produced by [[ivfAppend]]).
    */
  def ivfSearchOn(spark: SparkSession, dir: String, lists: DataFrame,
      qVecs: DataFrame, nprobe: Int = 4, k: Int = 10): DataFrame =
    searchIvf(lists, ivfCentroids(spark, dir), qVecs, nprobe, k)

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
