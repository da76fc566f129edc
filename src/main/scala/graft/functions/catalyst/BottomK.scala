package graft.functions.catalyst

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded bottom-k as a native Catalyst aggregate
  * (`graft_bottom_k(value, k)`): the `k` SMALLEST values of any
  * orderable input (atomic, array or struct — struct order is the
  * field-by-field natural order, so `struct(sortKey, tiebreak,
  * payload…)` rides the payload along for free), returned sorted
  * ascending as `array<typeof(value)>`.
  *
  * This is the two-phase answer to the per-group
  * `row_number().over(Window.partitionBy(g).orderBy(…)) <= k`
  * anti-pattern: a rank window funnels EVERY row of a group through
  * one reducer's sort, so a 10-value stratum key over a 100 TB corpus
  * sorts ~10% of the corpus per task to keep k rows. Here each map
  * partition keeps a k-bounded heap per group (partial aggregation —
  * ObjectHashAggregate), merges are heap unions re-capped at k, and
  * only `k × groups × partitions` summary rows ever shuffle. Identical
  * selection semantics to the window whenever the value is
  * duplicate-free (the deterministic-sample contract: a unique
  * tiebreak column inside the struct).
  *
  * Null inputs are skipped (a NULL has no rank); k must be a positive
  * integral literal, capped at 2^22 — the buffer is driver/executor
  * memory, not a spillable sort.
  */
case class BottomK(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  /** k as a validated literal, or the failure message — shared by the
    * ANALYSIS-TIME check (an invalid k must fail the query plan, not
    * a retried executor task) and the runtime accessor. */
  private def kValidated: Either[String, Int] =
    if (!kExpr.foldable) Left("graft_bottom_k: k must be a literal")
    else kExpr.eval() match {
      case null => Left("graft_bottom_k: k must not be NULL")
      case i: Int => checkRange(i.toLong)
      case l: Long => checkRange(l)
      case s: Short => checkRange(s.toLong)
      case other => Left(s"graft_bottom_k: k must be integral, got $other")
    }
  private def checkRange(v: Long): Either[String, Int] =
    if (v >= 1 && v <= (1L << 22)) Right(v.toInt)
    else Left(s"graft_bottom_k: k must be in [1, 2^22], got $v — the " +
      "heap is executor memory, not a spillable sort")

  private lazy val k: Int = kValidated.fold(
    msg => throw new IllegalArgumentException(msg), identity)

  // max-heap over the kept values: head = largest kept, evicted first
  private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else {
      val ord = TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
      if (!ord.isSuccess) ord
      else kValidated.fold(
        msg => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(msg),
        _ => TypeCheckResult.TypeCheckSuccess)
    }
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomK =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    new mutable.PriorityQueue[Any]()(ordering)

  /** Keep `v` iff the heap is under k or `v` beats the current
    * k-th smallest; copy ONLY on keep (the hot path over a 100 TB
    * scan must not allocate per row once heaps are warm). */
  private def insert(buffer: mutable.PriorityQueue[Any], v: Any,
                     alreadyCopied: Boolean): Unit =
    if (buffer.size < k) {
      buffer.enqueue(if (alreadyCopied) v else InternalRow.copyValue(v))
    } else if (ordering.lt(v, buffer.head)) {
      buffer.dequeue()
      buffer.enqueue(if (alreadyCopied) v else InternalRow.copyValue(v))
    }

  override def update(buffer: mutable.PriorityQueue[Any],
                      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v, alreadyCopied = false)
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[Any],
                     other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(insert(buffer, _, alreadyCopied = true))
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buffer.toArray.sorted(ordering))

  // serialization rides UnsafeProjection over the child type — the
  // same idiom Spark's own Collect/Percentile aggregates use, so any
  // orderable type round-trips without per-type code
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def serialize(buffer: mutable.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { v =>
      val bs = serProj(InternalRow(v)).getBytes
      out.writeInt(bs.length)
      out.write(bs)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.PriorityQueue[Any]()(ordering)
    val row = new UnsafeRow(1)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      row.pointTo(b, len)
      buf.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_bottom_k"
}
