package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding math over array columns — pure built-in higher-order
  * functions so the whole similarity pipeline stays codegen'd.
  *
  * FP note: `aggregate` folds left-to-right, the same sequential order
  * DuckDB's list_dot_product uses, so doubles are bit-identical to the
  * oracle (verified empirically) — no rounding slop needed.
  */
object VectorFns {

  /** float[] -> double[] (exact widening). */
  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** MinHash signature (k affine permutations of a 64-bit shingle
    * hash) — delegated to the [[MinHashSignature]] custom expression
    * (one k×n loop; hashes each shingle once).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    MinHashSignature.minhash(shingles, k)

  /** LSH band hashes: split a k-length signature into nBands bands of
    * rowsPerBand and hash each band (band join key for candidate
    * generation).
    */
  def bandHashes(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)),
      b => xxhash64(b, slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** MinHash Jaccard estimate: fraction of matching signature slots. */
  def minhashEstimate(sa: Column, sb: Column): Column =
    size(filter(zip_with(sa, sb, (x, y) => x === y), p => p))
      .cast(DoubleType) / size(sa)

  /** Projection of v onto a deterministic pseudo-random hyperplane
    * (coefficients derived from xxhash64(plane, dim) — no stored
    * model, reproducible on any cluster).
    */
  private def planeProj(v: Column, p: Column): Column =
    aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, d) => x * ((pmod(xxhash64(p, d), lit(1000L)) - 500L) / 500.0)),
      lit(0.0), (a, x) => a + x)

  /** Random-hyperplane LSH bucket: shift-accumulated sign bits of
    * nPlanes projections (16 planes -> 16-bit bucket id).
    */
  def hyperplaneBucket(v: Column, nPlanes: Int): Column =
    aggregate(
      sequence(lit(0), lit(nPlanes - 1)),
      lit(0L),
      (acc, p) => acc * 2 + when(planeProj(v, p) >= 0, 1L).otherwise(0L))
}
