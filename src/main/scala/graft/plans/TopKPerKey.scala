package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.{catalystExpr, datasetOfRows}
import org.apache.spark.sql.types.LongType

/** Top-k rows per key (SURVEY §2 G4): the whole-operator Catalyst path
  * — logical node + planner strategy + partial/final physical execs.
  *
  * Why not window row_number + filter: a window sorts EVERY row of
  * every key partition and only then discards all but k — at 100 TB
  * the sort and the full shuffle dominate. This operator keeps a
  * k-bounded binary heap per key on the map side, shuffles only the
  * ≤ k×keys×partitions survivors, and merges heaps on the reduce side.
  * Shuffle volume and memory are O(k·|keys|), independent of row
  * count per key.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: AttributeReference, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Per-key k-bounded heap collector shared by both exec phases. */
object TopKHeaps {
  /** worst-of-the-best at index 0 (reverse sort order) */
  final class Heap(ord: Ordering[InternalRow], k: Int) {
    private val a = new Array[InternalRow](k)
    var size = 0
    def offer(row: InternalRow): Unit = {
      if (size < k) {
        a(size) = row.copy(); size += 1; siftUp(size - 1)
      } else if (ord.compare(row, a(0)) < 0) { // better than current worst
        a(0) = row.copy(); siftDown(0)
      }
    }
    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && ord.compare(a(i), a((i - 1) / 2)) > 0) {
        val t = a(i); a(i) = a((i - 1) / 2); a((i - 1) / 2) = t
        i = (i - 1) / 2
      }
    }
    private def siftDown(i0: Int): Unit = {
      var i = i0
      var go = true
      while (go) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && ord.compare(a(l), a(m)) > 0) m = l
        if (r < size && ord.compare(a(r), a(m)) > 0) m = r
        if (m == i) go = false
        else { val t = a(i); a(i) = a(m); a(m) = t; i = m }
      }
    }
    /** contents best-first */
    def sorted: Array[InternalRow] = {
      val out = java.util.Arrays.copyOf(a, size)
      java.util.Arrays.sort(out, ord)
      out
    }
    def unsorted: Array[InternalRow] = java.util.Arrays.copyOf(a, size)
  }

  def collect(it: Iterator[InternalRow], keyProj: UnsafeProjection,
      ord: Ordering[InternalRow], k: Int): java.util.HashMap[UnsafeRow, Heap] = {
    val heaps = new java.util.HashMap[UnsafeRow, Heap]()
    while (it.hasNext) {
      val row = it.next()
      val key = keyProj(row)
      var h = heaps.get(key)
      if (h == null) { h = new Heap(ord, k); heaps.put(key.copy(), h) }
      h.offer(row)
    }
    heaps
  }
}

/** Map-side pre-pruning: emits at most k rows per key per partition. */
case class PartialTopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keys, child.output)
      val ord = new LazilyGeneratedOrdering(order, child.output)
      val heaps = TopKHeaps.collect(it, keyProj, ord, k)
      val hIt = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var cur: Array[InternalRow] = Array.empty
        private var i = 0
        override def hasNext: Boolean = {
          while (i >= cur.length && hIt.hasNext) { cur = hIt.next().unsorted; i = 0 }
          i < cur.length
        }
        override def next(): InternalRow = { val r = cur(i); i += 1; r }
      }
    }, preservesPartitioning = true)

  override protected def withNewChildInternal(c: SparkPlan): PartialTopKPerKeyExec =
    copy(child = c)
}

/** Final per-key top-k + rank assignment; requires co-location by key. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keys, child.output)
      val ord = new LazilyGeneratedOrdering(order, child.output)
      val heaps = TopKHeaps.collect(it, keyProj, ord, k)
      val outProj = UnsafeProjection.create(output, output)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
      val joined = new JoinedRow
      val hIt = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var cur: Array[InternalRow] = Array.empty
        private var i = 0
        override def hasNext: Boolean = {
          while (i >= cur.length && hIt.hasNext) { cur = hIt.next().sorted; i = 0 }
          i < cur.length
        }
        override def next(): InternalRow = {
          val r = cur(i); i += 1
          // 1-based rank within key, typed like the rewritten attribute
          if (rankIsInt) rankRow.setInt(0, i) else rankRow.setLong(0, i.toLong)
          outProj(joined(r, rankRow))
        }
      }
    }, preservesPartitioning = true)

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Planner strategy: partial below (pre-shuffle), final above;
  * EnsureRequirements inserts the key exchange between them.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyExec(t.keys, t.order, t.k, t.rankAttr,
        PartialTopKPerKeyExec(t.keys, t.order, t.k, planLater(t.child))) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object TopK {
  /** Register the strategy once per session (idempotent). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = strategies :+ TopKStrategy
  }

  /** Top-k rows per key with a 1-based rank column appended. `order`
    * takes Column sort expressions (e.g. col("sim").desc, col("id").asc);
    * ties must be broken by the ordering for deterministic output.
    */
  def perKey(df: DataFrame, keyCols: Seq[Column], order: Seq[Column], k: Int,
      rankName: String = "rnk"): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    ensureRegistered(spark)
    val plan = df.queryExecution.analyzed
    val keys = keyCols.map(catalystExpr)
    val sortOrders = order.map(c => catalystExpr(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    datasetOfRows(spark, TopKPerKey(keys, sortOrders, k, rankAttr, plan))
  }
}
