package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf, AbstractDT}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** G11: Misra–Gries frequent-items sketch as a typed imperative
  * aggregate — the one-pass bounded-memory answer to "which keys are
  * heavy" that a 100 TB scan can afford when the full groupBy cannot
  * (the exact vocabulary head, D29, shuffles every distinct key; this
  * carries exactly `capacity` counters per partial aggregate and is
  * MERGEABLE, so map-side partials combine like any other agg).
  *
  * Classic MG semantics (Misra & Gries 1982; merge rule from Agarwal
  * et al., "Mergeable Summaries", PODS 2012 — both public):
  *   - update(k): counter++ if tracked; else insert at 1 if fewer than
  *     `capacity` counters; else decrement ALL counters by 1, dropping
  *     zeros (the "pay one from everyone" step that buys the bound);
  *   - merge: pointwise counter sum, then subtract the (capacity+1)-th
  *     largest combined count from every counter and drop non-positive
  *     ones.
  *
  * Deterministic guarantees, independent of partitioning and merge
  * order (spec-pinned in FreqSketchSpec):
  *   est(k) ≤ true(k) ≤ est(k) + N/(capacity+1), and any key with
  *   true(k) > N/(capacity+1) is present in the sketch.
  * The output VALUES may differ run-to-run only within those bounds
  * when partitioning changes (like every mergeable sketch — cf. the
  * B18b HLL twin), so the sketch is spec-bounded rather than
  * hash-oracled; its exact twin (D29 text_vocab) is the oracled face.
  *
  * Output: array<struct<key string, cnt long>> sorted by estimated
  * count desc, key asc.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  private type Buf = scala.collection.mutable.HashMap[UTF8String, Long]

  override def inputTypes: Seq[AbstractDT] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.HashMap.empty[UTF8String, Long]

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val k = v.asInstanceOf[UTF8String]
    buf.get(k) match {
      case Some(c) => buf.update(k, c + 1)
      case None if buf.size < capacity =>
        // the incoming UTF8String may point into a reused row buffer
        buf.update(k.clone(), 1L)
      case None =>
        // decrement-all: every tracked key pays 1 for the untracked
        // arrival; zeros drop (this is where undercounting comes from,
        // and it is bounded by N/(capacity+1) total decrements)
        val dead = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
        buf.keysIterator.foreach { kk =>
          val c = buf(kk) - 1
          if (c == 0L) dead += kk else buf.update(kk, c)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everyone —
      // the mergeable-summaries rule that preserves the MG bound
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val dead = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      buf.keysIterator.foreach { kk =>
        val c = buf(kk) - sub
        if (c <= 0L) dead += kk else buf.update(kk, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val rows = buf.toArray
      .sortWith { case ((k1, c1), (k2, c2)) =>
        if (c1 != c2) c1 > c2 else k1.compareTo(k2) < 0
      }
      .map { case (k, c) => InternalRow(k, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MisraGries =
    copy(child = c)
}

object FreqSketch {
  /** Column face: MG sketch of a string column under `capacity`
    * counters — array<struct<key,cnt>> sorted cnt desc, key asc.
    */
  def mgSketch(c: Column, capacity: Int): Column =
    columnOf(MisraGries(expressionOf(c), capacity).toAggregateExpression())
}
