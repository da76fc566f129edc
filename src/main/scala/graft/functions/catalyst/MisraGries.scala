package graft.functions.catalyst

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native Catalyst aggregate
  * (`graft_mg_topk(item, capacity)`), the repo's custom-AGGREGATE
  * counterpart to its custom scalar expressions.
  *
  * Semantics (mergeable-summaries form, Agarwal et al., PODS 2012):
  * each partition keeps at most `capacity` counters; on overflow the
  * (capacity+1)-th largest count is subtracted from every counter and
  * non-positive ones are dropped — the same rule merges partial
  * summaries, so the aggregate is safe under ANY partitioning /
  * partial-aggregation plan. Guarantees, for n total rows:
  *  - returned counts are UNDER-estimates: `count_lo ≤ true count`,
  *    with `true − count_lo ≤ n / (capacity + 1)`;
  *  - every item with true count > n / (capacity + 1) is present
  *    (so with capacity ≥ distinct items the result is EXACT — the
  *    oracle-witnessable regime; the approximate regime's bounds are
  *    pinned in `MisraGriesSpec`).
  *
  * Scale shape: the buffer is capacity-bounded on every executor and
  * the output is one capacity-bounded array — heavy hitters over
  * 100 TB of tokens cost one partial-aggregated shuffle of k-entry
  * summaries, never a vocabulary-wide groupBy.
  *
  * Output: `array<struct<item: string, count_lo: bigint>>`, sorted by
  * (count_lo desc, item) — deterministic for a given summary.
  */
case class MisraGriesTopK(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val capacity: Int = {
    require(capacityExpr.foldable, "graft_mg_topk capacity must be a literal")
    val c = capacityExpr.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case other => throw new IllegalArgumentException(
        s"graft_mg_topk capacity must be integral, got $other")
    }
    require(c >= 1, s"graft_mg_topk capacity must be >= 1, got $c")
    c
  }

  override def children: Seq[Expression] = Seq(child, capacityExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren(0), capacityExpr = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lo", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buffer.update(item, buffer.getOrElse(item, 0L) + 1L)
      if (buffer.size > capacity) compress(buffer)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buffer.update(item, buffer.getOrElse(item, 0L) + c)
    }
    if (buffer.size > capacity) compress(buffer)
    buffer
  }

  /** Subtract the (capacity+1)-th largest count from every counter and
    * drop the non-positive ones — leaves at most `capacity` counters
    * and decreases each estimate by at most that threshold. */
  private def compress(buffer: mutable.HashMap[String, Long]): Unit = {
    val counts = buffer.values.toArray
    java.util.Arrays.sort(counts)
    val threshold = counts(counts.length - capacity - 1) // (capacity+1)-th largest
    val dead = mutable.ArrayBuffer.empty[String]
    buffer.foreach { case (item, c) =>
      val nc = c - threshold
      if (nc > 0) buffer.update(item, nc) else dead += item
    }
    dead.foreach(buffer.remove)
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
    })
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_mg_topk"
}
