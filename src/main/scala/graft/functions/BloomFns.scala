package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.{catalystExpr, columnOf}

/** Bloom-filter membership over Spark's own Catalyst kernels
  * (BloomFilterAggregate / BloomFilterMightContain — the pair Spark's
  * runtime row-group filtering uses, not exposed in the public
  * functions API): a distributed one-pass build that partial-merges
  * per-partition filters, and a codegen'd probe that rides the plan as
  * a literal. The membership trick for 100 TB joins: a set of N keys
  * costs ~1.2 bytes/key at 3% FPP, so the probe side drops the
  * guaranteed-absent majority BEFORE any shuffle, and false positives
  * are caught by the real join that follows.
  */
object BloomFns {

  /** Build the serialized filter over `c`'s values (hashed to 64 bits
    * in-plan). One aggregation job: per-partition filters OR-merge.
    */
  def build(df: DataFrame, c: Column, expectedItems: Long): Array[Byte] =
    df.select(columnOf(
        new BloomFilterAggregate(catalystExpr(xxhash64(c)), expectedItems)
          .toAggregateExpression()))
      .head.getAs[Array[Byte]](0)

  /** Membership probe against a driver-held serialized filter; the
    * bytes fold into the plan as a literal (executors deserialize
    * once). False positives possible, false negatives not.
    */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    columnOf(new BloomFilterMightContain(Literal(bloom),
      catalystExpr(xxhash64(c))))
}
