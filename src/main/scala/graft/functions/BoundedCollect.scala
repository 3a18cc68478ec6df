package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_list` with a HARD buffer bound: groups that exceed `maxN`
  * elements evaluate to NULL instead of materializing their list.
  *
  * This is the scale-safe fusion of "document-frequency cap" and
  * "posting-list collection" for the n-gram Jaccard join
  * ([[graft.operators.Dedup.ngramJaccardPairs]]): a boilerplate
  * shingle shared by millions of documents costs at most `maxN + 1`
  * buffer slots before collapsing to NULL — a plain `collect_list`
  * would buffer every one of those doc ids in a single aggregation
  * state (the classic heavy-hitter OOM), and capping AFTER collection
  * doesn't bound what was buffered. Map-side combine is preserved:
  * partial buffers cap at `maxN + 1` too, so merged state never grows
  * past the bound either.
  *
  * Element order is whatever update/merge order produced — callers
  * needing determinism sort the result (`sort_array`), which the
  * NULL-on-overflow contract keeps cheap.
  */
case class BoundedCollect(
    child: Expression,
    maxN: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  require(maxN >= 1, s"maxN must be >= 1, got $maxN")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bounded_collect"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): ArrayBuffer[Long] = new ArrayBuffer[Long](4)

  // Buffers hold at most maxN + 1 elements: the extra slot is the
  // overflow marker (size > maxN <=> the group blew the cap), and the
  // early-out keeps million-row heavy hitters O(1) after saturation.
  override def update(buffer: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null && buffer.length <= maxN) buffer += v.asInstanceOf[Long]
    buffer
  }

  override def merge(buffer: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (i < other.length && buffer.length <= maxN) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: ArrayBuffer[Long]): Any =
    if (buffer.length > maxN) null else new GenericArrayData(buffer.toArray)

  override def serialize(buffer: ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[Long](bytes.length / 8)
    while (bb.hasRemaining) out += bb.getLong()
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedCollect =
    copy(child = newChildren.head)
}
