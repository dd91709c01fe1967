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
    org.apache.spark.sql.graftbridge.columnOf(
      VecDot(org.apache.spark.sql.graftbridge.expressionOf(a),
        org.apache.spark.sql.graftbridge.expressionOf(b)))

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
    * rowsPerBand; the band SLICE itself is the join key (engines hash
    * it internally anyway, and an explicit xxhash64 here would be
    * oracle-opaque — slices keep the candidate join DuckDB-checkable).
    */
  def bandHashes(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)),
      b => slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))

  /** MinHash Jaccard estimate: fraction of matching signature slots. */
  def minhashEstimate(sa: Column, sb: Column): Column =
    size(filter(zip_with(sa, sb, (x, y) => x === y), p => p))
      .cast(DoubleType) / size(sa)

  /** Random-hyperplane LSH bucket: shift-accumulated sign bits of
    * nPlanes projections onto deterministic pseudo-random hyperplanes
    * — kernel expression (see [[VecKernels.hyperplaneBucket]]).
    */
  def hyperplaneBucket(v: Column, nPlanes: Int): Column =
    org.apache.spark.sql.graftbridge.columnOf(
      HyperplaneBucketExpr(
        org.apache.spark.sql.graftbridge.expressionOf(v), nPlanes))
}
