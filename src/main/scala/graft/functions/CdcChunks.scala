package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunks of a space-tokenized string in ONE pass —
  * the map-only form of [[graft.operators.Dedup.cdcChunks]]'s cut
  * rule: the stream is cut AFTER every token whose md5 first byte is
  * < `cutByte`, and each chunk is emitted as (chunk_text, n_tokens).
  *
  * The declarative formulation (posexplode every token, per-document
  * window running-sum for the chunk index, collect_list re-assembly)
  * shuffles the CORPUS'S ENTIRE TOKEN STREAM through a per-doc sort
  * before the first chunk exists — at 100 TB that exchange dwarfs the
  * chunking arithmetic. This expression produces complete chunks
  * inside the scan projection, so the substring-dedup chain's first
  * shuffle is the (chunk-hash-keyed, far smaller) postings aggregate.
  * Spec-pinned row-identical to the declarative window form, which is
  * kept as the portable twin.
  *
  * Cut-rule equivalence with the SQL oracle's
  * `substr(md5(token), 1, 2) < '<hex>'`: two-hex-digit strings order
  * lexicographically exactly as their byte values ('0'..'9' < 'a'..'f'
  * in ASCII), so the comparison is `firstByte < cutByte` with
  * `cutByte = parseInt(hex, 16)`. MessageDigest instances are
  * per-thread (an Expression object can be shared; MD5 state is not
  * thread-safe mid-digest). */
case class CdcChunks(child: Expression, cutByte: Int)
  extends UnaryExpression with CodegenFallback {

  require(cutByte >= 0 && cutByte <= 255, s"cutByte must be a byte value, got $cutByte")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_text", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  @transient private lazy val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val md = md5Local.get()
    val chunks = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val sb = new java.lang.StringBuilder
    var n = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (n > 0L) sb.append(' ')
      sb.append(w)
      n += 1L
      val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((d(0) & 0xFF) < cutByte) {
        chunks += new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString), n))
        sb.setLength(0)
        n = 0L
      }
      i += 1
    }
    // tokens after the last boundary form the final chunk; a document
    // ENDING on a boundary token leaves nothing open (no empty chunk)
    if (n > 0L)
      chunks += new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString), n))
    new GenericArrayData(chunks.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
