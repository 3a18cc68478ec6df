package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as ONE native aggregate: at most
  * `k` counters per group, whatever the term cardinality.
  *
  * The exact per-term rollup shuffles every distinct term; this
  * aggregate's state is k entries — combinable map-side like any
  * sum, so the shuffle carries k (term, count) pairs per partition
  * per group no matter how many distinct terms the corpus holds.
  * That is the only heavy-hitter shape that survives a 100 TB token
  * stream whose vocabulary does not fit anywhere.
  *
  * Guarantees (Misra-Gries 1982; merged form Agarwal et al. 2013,
  * "Mergeable Summaries"): every estimate UNDERcounts, by at most
  * N/(k+1) for a group of N items — so any term with true count
  * > N/(k+1) is guaranteed present. The sketch CONTENT depends on
  * update/merge order (like Spark's own GK quantile sketch), so
  * oracle-facing consumers emit the error-contract booleans, not the
  * raw counters — `graft.operators.Corpus.heavyHittersAudit` is the
  * validation row that licenses the sketch at scale.
  *
  * update: present → +1; room → insert 1; full → decrement ALL
  * (dropping zeros) — the classic k-counter form. merge: sum both
  * maps, then subtract the (k+1)-th largest count from every entry
  * and drop the non-positive (the mergeable-summaries reduction,
  * error bounds add).
  */
/** The Misra-Gries update/reduce core, shared by the batch aggregate
  * below and the streaming face
  * ([[graft.streaming.Streams.heavyHittersStream]]) so the two can
  * never disagree on the sketch semantics. */
object MisraGries {

  /** One observation: present → +1; room → insert 1; full →
    * decrement every counter, dropping zeros. */
  def update(buffer: mutable.HashMap[String, Long], term: String, k: Int): Unit =
    buffer.get(term) match {
      case Some(c) => buffer.update(term, c + 1)
      case None if buffer.size < k => buffer.update(term, 1L)
      case None =>
        // snapshot the keys: mutating during keysIterator is unsafe
        buffer.keys.toArray.foreach { t =>
          val nc = buffer(t) - 1
          if (nc == 0) buffer.remove(t) else buffer.update(t, nc)
        }
    }

  /** Shrink an over-full merged buffer back to ≤ k entries: subtract
    * the (k+1)-th largest count from everything (the
    * mergeable-summaries reduction; error bounds add). */
  def reduce(buffer: mutable.HashMap[String, Long], k: Int): Unit =
    if (buffer.size > k) {
      val sorted = buffer.values.toArray
      scala.util.Sorting.quickSort(sorted)
      val cut = sorted(sorted.length - 1 - k) // (k+1)-th largest
      buffer.keys.toArray.foreach { t =>
        val nc = buffer(t) - cut
        if (nc <= 0) buffer.remove(t) else buffer.update(t, nc)
      }
    }
}

case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_freq_items"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string term argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    new mutable.HashMap[String, Long]()

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of Spark's reused UTF8String buffer before keying
      val term = v.asInstanceOf[UTF8String].toString
      MisraGries.update(buffer, term, k)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buffer.update(t, buffer.getOrElse(t, 0L) + c)
    }
    MisraGries.reduce(buffer, k)
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    // (est desc, term asc) so the emitted array is a pure function of
    // the sketch state
    val rows = buffer.toArray.sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buffer.toArray
    val bytes = entries.map { case (t, _) => t.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new mutable.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      out.update(new String(b, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
}
