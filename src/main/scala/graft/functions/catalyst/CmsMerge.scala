package graft.functions.catalyst

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.CountMinSketch

/** `graft_cms_merge(sketch_binary) -> binary` — union of
  * count-min sketches as a native aggregate: the ROLLUP half of the
  * CMS family ([[CmsQuery]] is the point-query half, Spark's built-in
  * `count_min_sketch` the build half). CMS counters are plain sums,
  * so merging per-partition / per-source sketches yields the EXACT
  * sketch the corpus-wide aggregate would build — estimates identical,
  * not merely bounded (Cormode & Muthukrishnan 2005).
  *
  * This is the pattern that makes sketches useful at 100 TB: build
  * once per partition/source/day (map-side, data-local), persist the
  * kilobyte sketches, answer corpus-wide frequency questions by
  * merging the sketches — never re-scanning the corpus.
  *
  * Sketches must share (depth, width, seed) — Spark's
  * `IncompatibleMergeException` propagates loudly rather than
  * silently blending incompatible summaries. Null inputs are skipped
  * (the aggregate over zero sketches is SQL-conventional NULL).
  */
case class CmsMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CountMinSketch]] {

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMerge =
    copy(child = newChildren(0))

  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Option[CountMinSketch] = None

  private def read(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  private def mergeInto(buffer: Option[CountMinSketch],
                        sk: CountMinSketch): Option[CountMinSketch] =
    buffer match {
      case None => Some(sk)
      case Some(b) => b.mergeInPlace(sk); buffer
    }

  override def update(buffer: Option[CountMinSketch],
                      input: InternalRow): Option[CountMinSketch] = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeInto(buffer, read(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: Option[CountMinSketch],
                     other: Option[CountMinSketch]): Option[CountMinSketch] =
    other match {
      case None => buffer
      case Some(sk) => mergeInto(buffer, sk)
    }

  override def eval(buffer: Option[CountMinSketch]): Any =
    buffer.map { sk =>
      val bos = new ByteArrayOutputStream()
      sk.writeTo(bos)
      bos.toByteArray
    }.orNull

  override def serialize(buffer: Option[CountMinSketch]): Array[Byte] =
    eval(buffer) match {
      case null => Array.emptyByteArray
      case b: Array[Byte] => b
    }

  override def deserialize(bytes: Array[Byte]): Option[CountMinSketch] =
    if (bytes.isEmpty) None else Some(read(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_cms_merge"
}
