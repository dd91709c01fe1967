package graft

import org.apache.spark.sql.functions._

/** Every declared query runs at sf0.001 and returns rows; every oracle
  * key exists in queries (the driver contract invariant).
  */
class QueriesSpec extends GraftSpec {

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query impl: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, Sf)
      val n = df.count()
      // near-dup / embedding-dup pair sets may be legitimately small at
      // the smallest sf, but must not error; all others must emit rows.
      val mayBeEmpty = Set("dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_simhash", "dedup_embedding")
      assert(n > 0 || mayBeEmpty(name), s"$name returned no rows")
    }
  }

  test("q1 aggregates are internally consistent") {
    val r = SparkEntry.queries("q1_pricing_summary")(spark, Sf).collect()
    assert(r.length == 6) // 3 returnflags x 2 linestatus
    r.foreach { row =>
      val sumQty = row.getAs[Double]("sum_qty")
      val avgQty = row.getAs[Double]("avg_qty")
      val n = row.getAs[Long]("count_order")
      assert(math.abs(sumQty / n - avgQty) < 1e-9)
    }
  }

  test("evt_latest_per_key has one row per user") {
    val df = SparkEntry.queries("evt_latest_per_key")(spark, Sf)
    val users = Tables.events(spark, Sf).select("user_id").distinct().count()
    assert(df.count() == users)
  }

  test("evt_upsert_latest key is unique") {
    val df = SparkEntry.queries("evt_upsert_latest")(spark, Sf)
    assert(df.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("gzip roundtrip holds for every document") {
    val df = SparkEntry.queries("gzip_content")(spark, Sf)
    assert(df.filter(!col("roundtrip_ok")).count() == 0)
    // compressible text must actually shrink on average
    val shrunk = df.filter(col("gzip_size") < col("orig_size")).count()
    assert(shrunk > df.count() / 2)
  }

  test("zip_expand yields both entries per archive") {
    val df = SparkEntry.queries("zip_expand")(spark, Sf)
    val perDoc = df.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") =!= 2).count() == 0)
  }
}
