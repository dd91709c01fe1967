package graft

import graft.functions.SimHashKernel
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** The kernel expressions exposed as SQL functions (GraftExtensions):
  * a SQL user of the library gets the same codegen'd kernels the
  * DataFrame API wraps.
  */
class SqlFunctionsSpec extends GraftSpec {

  private lazy val sparkReady: Boolean = {
    graft.plans.GraftExtensions.registerFunctions(spark)
    true
  }

  test("graft_gzip / graft_gunzip roundtrip from SQL") {
    assert(sparkReady)
    val r = spark.sql(
      """SELECT CAST(graft_gunzip(graft_gzip(encode('log agent payload', 'UTF-8')))
        |AS STRING) AS s""".stripMargin).head()
    assert(r.getString(0) == "log agent payload")
  }

  test("graft_simhash64 from SQL matches the kernel") {
    assert(sparkReady)
    val toks = Seq("spark", "native", "engine", "spark")
    val expect = SimHashKernel.compute(
      new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]))
    val got = spark.sql(
      s"SELECT graft_simhash64(array(${toks.map("'" + _ + "'").mkString(",")}))")
      .head().getLong(0)
    assert(got == expect)
  }

  test("graft_minhash from SQL produces the k-slot signature") {
    assert(sparkReady)
    val row = spark.sql(
      "SELECT graft_minhash(array('a b c', 'b c d', 'c d e'), 16) AS sig").head()
    val sig = row.getSeq[Long](0)
    assert(sig.length == 16)
    assert(sig.distinct.length > 1) // real minima, not a constant fill
  }

  test("graft_winnow from SQL fingerprints text") {
    assert(sparkReady)
    val fps = spark.sql(
      "SELECT graft_winnow('the quick brown fox jumps over the dog', 8, 4) AS f")
      .head().getSeq[Long](0)
    assert(fps.nonEmpty)
  }

  test("graft_gbk_decode from SQL") {
    assert(sparkReady)
    import spark.implicits._
    graft.plans.GraftExtensions.registerFunctions(spark) // idempotent
    val df = Seq(Tuple1("日志采集".getBytes("GBK"))).toDF("b")
    df.createOrReplaceTempView("gbk_t")
    assert(spark.sql("SELECT graft_gbk_decode(b) FROM gbk_t").head().getString(0)
      == "日志采集")
  }

  test("graft_strhash64 from SQL matches the kernel") {
    assert(sparkReady)
    val got = spark.sql("SELECT graft_strhash64('spark native engine')")
      .head().getLong(0)
    assert(got == graft.functions.StrHash.hash64(
      UTF8String.fromString("spark native engine")))
  }

  test("graft_window_hashes from SQL matches the kernel, and type-errors cleanly") {
    assert(sparkReady)
    val got = spark.sql(
      "SELECT graft_window_hashes(split('a b c d', ' '), 2)")
      .head().getSeq[Long](0)
    val expect = (0 to 2).map(i =>
      graft.functions.StrHash.hash64(UTF8String.fromString(
        Seq("a", "b", "c", "d").slice(i, i + 2).mkString(" "))))
    assert(got == expect)
    // ExpectsInputTypes: a non-array argument is an ANALYSIS error,
    // not a runtime ClassCastException
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_window_hashes('not an array', 2)").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("type"))
    val ex2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_strhash64(123)").collect()
    }
    assert(ex2.getMessage.toLowerCase.contains("type"))
  }

  test("graft_window_hashes: null elements hash as empty strings with separators retained") {
    assert(sparkReady)
    // the documented rule (WindowHashes Scaladoc): a null token folds
    // as the empty string but KEEPS its separator — positional, unlike
    // concat_ws which would drop null + separator and collide windows
    val got = spark.sql(
      "SELECT graft_window_hashes(array('a', CAST(NULL AS STRING), 'b'), 3)")
      .head().getSeq[Long](0)
    val expect = Seq(graft.functions.StrHash.hash64(
      UTF8String.fromString("a  b")))
    assert(got == expect)
  }

  test("graft_tfidf / graft_pmi / graft_bm25_idf: rational scores from SQL, analysis-checked") {
    assert(sparkReady)
    graft.plans.GraftExtensions.registerFunctions(spark)
    // the exact arithmetic contract: integer cross products, one
    // exactly-rounded double division — replicable by plain SQL in any
    // engine, which is what the D31/D32/D34 oracles rely on
    val r = spark.sql(
      "SELECT graft_tfidf(3L, 2L, 500L), graft_pmi(4L, 10L, 20L, 60000L), " +
      "graft_bm25_idf(500L, 7L)").head()
    assert(r.getDouble(0) == (3L * 500L).toDouble / 2.0)
    assert(r.getDouble(1) == (4L * 60000L).toDouble / (10L * 20L).toDouble)
    assert(r.getDouble(2) == ((500L - 7L).toDouble + 0.5) / (7L.toDouble + 0.5))
    // ExpectsInputTypes: wrong argument types are ANALYSIS errors
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bm25_idf('x', 7L)").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("type"))
    val ex2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_tfidf(array(1L), 2L, 3L)").collect()
    }
    assert(ex2.getMessage.toLowerCase.contains("type"))
  }

  test("graft_mix64 / graft_qlog2: integer kernels from SQL, analysis-checked") {
    assert(sparkReady)
    graft.plans.GraftExtensions.registerFunctions(spark)
    val r = spark.sql("SELECT graft_mix64(42L), graft_qlog2(1024L), " +
      "graft_qlog2(3L)").head()
    assert(r.getLong(0) == graft.functions.IntMath.mix64(42L))
    assert(r.getLong(1) == 10L * 1024L)
    assert(r.getLong(2) == graft.functions.IntMath.qlog2(3L))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_qlog2('x')").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("type"))
  }

  test("graft_zinterleave: Morton kernel from SQL, range-guarded") {
    assert(sparkReady)
    graft.plans.GraftExtensions.registerFunctions(spark)
    val r = spark.sql(
      "SELECT graft_zinterleave(5L, 3L), graft_zinterleave(0L, 0L)").head()
    assert(r.getLong(0) == graft.functions.ZMath.interleave(5L, 3L))
    assert(r.getLong(1) == 0L)
    val ex = intercept[Exception] {
      spark.sql(s"SELECT graft_zinterleave(${1L << 31}L, 0L)").collect()
    }
    assert(ex.getMessage.contains("31-bit"))
  }

  test("score kernels survive 128-bit cross products (counts near 2^63)") {
    assert(sparkReady)
    graft.plans.GraftExtensions.registerFunctions(spark)
    import java.math.BigInteger
    def big(a: Long, b: Long): Double =
      BigInteger.valueOf(a).multiply(BigInteger.valueOf(b)).doubleValue()
    // the 100 TB envelope: common-token counts ~1e12 make ca*cb ~1e24,
    // far past Long — the kernel must fall back to the exact 128-bit
    // product, correctly rounded (== an external engine's
    // HUGEINT -> DOUBLE cast), not wrap silently
    val ca = 1000000000000L; val cb = 900000000000L
    val cab = 5000000000L; val n = 20000000000000L
    assert(graft.functions.ScoreMath.pmi(cab, ca, cb, n) ==
      big(cab, n) / big(ca, cb))
    // boundary: operands near 2^63 (worst case for the wrap)
    val huge = Long.MaxValue - 1
    assert(graft.functions.ScoreMath.pmi(huge, huge, huge, huge) ==
      big(huge, huge) / big(huge, huge))
    assert(graft.functions.ScoreMath.tfidf(huge, 3L, huge) ==
      big(huge, huge) / 3.0)
    // fast path unchanged: in-range products bit-match plain Long math
    assert(graft.functions.ScoreMath.pmi(4L, 10L, 20L, 60000L) ==
      (4L * 60000L).toDouble / (10L * 20L).toDouble)
    // and the SQL surface (codegen path) agrees with the kernel
    val r = spark.sql(
      s"SELECT graft_pmi(${cab}L, ${ca}L, ${cb}L, ${n}L), " +
      s"graft_tfidf(${huge}L, 3L, ${huge}L)").head()
    assert(r.getDouble(0) == big(cab, n) / big(ca, cb))
    assert(r.getDouble(1) == big(huge, huge) / 3.0)
  }

  test("graft_vec_dot / graft_hyperplane_bucket from SQL match the kernels") {
    assert(sparkReady)
    import spark.implicits._
    graft.plans.GraftExtensions.registerFunctions(spark)
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").createOrReplaceTempView("vec_t")
    assert(spark.sql("SELECT graft_vec_dot(a, b) FROM vec_t")
      .head().getDouble(0) == 32.0)
    val viaSql = spark.sql("SELECT graft_hyperplane_bucket(a, 4) FROM vec_t")
      .head().getLong(0)
    val viaApi = spark.table("vec_t")
      .select(graft.functions.VectorFns.hyperplaneBucket(
        org.apache.spark.sql.functions.col("a"), 4)).head().getLong(0)
    assert(viaSql == viaApi)
  }

  test("graft_mg_sketch from SQL matches the aggregate kernel") {
    assert(sparkReady)
    import spark.implicits._
    graft.plans.GraftExtensions.registerFunctions(spark)
    Seq("a", "b", "a", "c", "a", "b").toDF("s")
      .createOrReplaceTempView("mg_t")
    val viaSql = spark.sql("SELECT graft_mg_sketch(s, 8) FROM mg_t")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    // arity errors surface at resolution (the fn-builder guard)
    intercept[IllegalArgumentException](
      spark.sql("SELECT graft_mg_sketch(s) FROM mg_t").collect())
  }
}
