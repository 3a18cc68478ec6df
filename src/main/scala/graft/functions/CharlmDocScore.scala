package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimal open-addressing long→long map (linear probing, power-of-2
  * capacity, `Long.MinValue` empty sentinel — packed trigram keys are
  * always ≥ 0). Exists so the per-trigram model lookups box nothing:
  * the scorer probes it twice per DISTINCT doc trigram. */
private[functions] final class LongLongMap(expected: Int) {
  private val cap = Integer.highestOneBit(math.max(8, expected * 2) - 1) << 1
  private val mask = cap - 1
  private val keys = new Array[Long](cap)
  java.util.Arrays.fill(keys, Long.MinValue)
  private val vals = new Array[Long](cap)

  def put(k: Long, v: Long): Unit = {
    var i = (java.lang.Long.hashCode(k * -7046029254386353131L) & mask)
    while (keys(i) != Long.MinValue && keys(i) != k) i = (i + 1) & mask
    keys(i) = k
    vals(i) = v
  }

  def addTo(k: Long, v: Long): Unit = {
    var i = (java.lang.Long.hashCode(k * -7046029254386353131L) & mask)
    while (keys(i) != Long.MinValue && keys(i) != k) i = (i + 1) & mask
    if (keys(i) == k) vals(i) += v else { keys(i) = k; vals(i) = v }
  }

  /** 0 when absent — the smoothed formula's COALESCE. */
  def getOrZero(k: Long): Long = {
    var i = (java.lang.Long.hashCode(k * -7046029254386353131L) & mask)
    while (keys(i) != Long.MinValue) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    0L
  }
}

/** The corpus char-trigram model as a compact executor-side object:
  * `tri -> C(abc)` plus the two DERIVED tables the smoothed formula
  * needs — `bi -> C(ab) = Σ_c C(abc)` and the alphabet size `S` =
  * distinct third-position chars. Both derivations are integer
  * aggregates over the trigram keys, computed at deserialization, so
  * they can never disagree with the serialized numerators (the same
  * single-table invariant [[graft.operators.TextOps.charlmScoreAgainstModel]]'s
  * join path keeps by deriving them in-plan).
  *
  * Keys live as PACKED code points — 21 bits per char, three chars in
  * one long (`cp0<<42 | cp1<<21 | cp2`; the bigram key is `tri>>>21`).
  * Unsigned code-point order IS UTF-8 byte order (the encoding is
  * order-preserving and prefix-free), so an ascending primitive sort
  * of packed trigrams folds in exactly the `UTF8String.compareTo` /
  * DuckDB-binary-collation order the bit-exactness contract pins —
  * with zero per-position allocation and primitive map probes.
  *
  * The wire format is the trigram table alone: `int count`, then per
  * row `int len | utf8 bytes | long c3`. A trigram is ≤ 3 code points
  * ≤ 12 UTF-8 bytes, so a 1M-trigram model serializes to ~20 MB —
  * the size the caller's row cap bounds before choosing this path. */
final class CharlmModel(packed: Array[Long], counts: Array[Long]) {

  private val c3 = new LongLongMap(packed.length)
  private val c2 = new LongLongMap(packed.length)
  private val thirdChars = new java.util.HashSet[java.lang.Long]()
  locally {
    var i = 0
    while (i < packed.length) {
      c3.put(packed(i), counts(i))
      c2.addTo(packed(i) >>> 21, counts(i))
      thirdChars.add(java.lang.Long.valueOf(packed(i) & 0x1FFFFFL))
      i += 1
    }
  }

  /** Alphabet size: distinct third-position chars across the model —
    * `countDistinct(substring(tri, 3, 1))`, as a double for the
    * smoothing denominator. */
  val alphabet: Double = thirdChars.size().toDouble

  /** One doc's `(n_tri, psum, rare_tri)` — the shared per-doc pass
    * behind [[CharlmDocScore]] and [[CharlmRareFrac]]. Null for texts
    * shorter than 3 chars (no trigram positions — the join path drops
    * them before its explode). */
  def stats(text: UTF8String, rareBelow: Double): GenericInternalRow = {
    val cps = CharlmModel.codePoints(text)
    val n = cps.length
    if (n < 3) return null
    val m = n - 2
    val tris = new Array[Long](m)
    var i = 0
    while (i < m) {
      tris(i) = (cps(i).toLong << 42) | (cps(i + 1).toLong << 21) | cps(i + 2).toLong
      i += 1
    }
    // sort once: run-length counting replaces the hash rollup AND
    // yields the deterministic ascending-byte fold order for free
    java.util.Arrays.sort(tris)
    var acc = 0.0
    var rare = 0L
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && tris(j) == tris(i)) j += 1
      val cnt = (j - i).toLong
      val p = (c3.getOrZero(tris(i)).toDouble + 1.0) /
        (c2.getOrZero(tris(i) >>> 21).toDouble + alphabet)
      acc += cnt.toDouble * p
      if (p < rareBelow) rare += cnt
      i = j
    }
    new GenericInternalRow(Array[Any](m.toLong, acc, rare))
  }
}

object CharlmModel {

  /** UTF-8 code points of a string, stepping by
    * [[UTF8String.numBytesForFirstByte]] — the exact char boundaries
    * `numChars`/`substringSQL` walk, so char COUNT and char IDENTITY
    * always agree with the join path's `substring` semantics. Valid
    * UTF-8 decodes to true code points (≤ 21 bits); a malformed or
    * truncated head byte decodes deterministically from whatever
    * bytes its length class claims. */
  def codePoints(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    val out = new Array[Int](s.numChars())
    var i = 0
    var c = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      val len = UTF8String.numBytesForFirstByte(bytes(i))
      val cp =
        if (len == 1 || i + len > bytes.length) b0
        else len match {
          case 2 => ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F)
          case 3 => ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
          case _ => ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
            ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F)
        }
      out(c) = cp
      c += 1
      i += len
    }
    out
  }

  /** Packed trigram -> its 3-char string, UTF-8 re-encoded from the
    * code points (the inverse of the [[codePoints]] packing on valid
    * UTF-8). */
  def unpack(tri: Long): UTF8String = {
    val cps = Array((tri >>> 42).toInt, ((tri >>> 21) & 0x1FFFFF).toInt, (tri & 0x1FFFFF).toInt)
    val bytes = new Array[Byte](cps.iterator.map(cp =>
      if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4).sum)
    var o = 0
    cps.foreach { cp =>
      if (cp < 0x80) { bytes(o) = cp.toByte; o += 1 }
      else if (cp < 0x800) {
        bytes(o) = (0xC0 | (cp >> 6)).toByte
        bytes(o + 1) = (0x80 | (cp & 0x3F)).toByte
        o += 2
      } else if (cp < 0x10000) {
        bytes(o) = (0xE0 | (cp >> 12)).toByte
        bytes(o + 1) = (0x80 | ((cp >> 6) & 0x3F)).toByte
        bytes(o + 2) = (0x80 | (cp & 0x3F)).toByte
        o += 3
      } else {
        bytes(o) = (0xF0 | (cp >> 18)).toByte
        bytes(o + 1) = (0x80 | ((cp >> 12) & 0x3F)).toByte
        bytes(o + 2) = (0x80 | ((cp >> 6) & 0x3F)).toByte
        bytes(o + 3) = (0x80 | (cp & 0x3F)).toByte
        o += 4
      }
    }
    UTF8String.fromBytes(bytes)
  }

  /** `(tri utf8 bytes, c3)` rows -> wire bytes. */
  def serialize(rows: Array[(Array[Byte], Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + rows.iterator.map(_._1.length + 12).sum)
    bb.putInt(rows.length)
    rows.foreach { case (k, v) => bb.putInt(k.length); bb.put(k); bb.putLong(v) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): CharlmModel = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val packed = new Array[Long](n)
    val counts = new Array[Long](n)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val k = new Array[Byte](len)
      bb.get(k)
      val cps = codePoints(UTF8String.fromBytes(k))
      // model keys are trigrams by construction; tolerate anything
      // shorter by zero-padding (an impossible doc trigram — never
      // probed, only occupies a slot)
      val cp0 = if (cps.length > 0) cps(0).toLong else 0L
      val cp1 = if (cps.length > 1) cps(1).toLong else 0L
      val cp2 = if (cps.length > 2) cps(2).toLong else 0L
      packed(i) = (cp0 << 42) | (cp1 << 21) | cp2
      counts(i) = bb.getLong()
      i += 1
    }
    new CharlmModel(packed, counts)
  }
}

/** `graft_charlm_counts(text)` — the charlm TRAINING aggregate: the
  * corpus's whole trigram count table `array<struct<tri, n>>` in one
  * pass, the packed-code-point discipline of [[CharlmModel.stats]]
  * applied to training. The explode-then-hash-aggregate form
  * generates `len-2` UTF8String rows per doc through the aggregate
  * machinery; this buffer counts packed longs per partition and
  * merges |Σ|³-bounded maps — no per-position allocation anywhere.
  * Counts are exact integers (order-free), and trigram strings are
  * re-encoded from the packed code points, so the emitted rows equal
  * the declarative form's bit-for-bit on valid UTF-8. */
case class CharlmCountsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tri", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_charlm_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Long] =
    new scala.collection.mutable.LongMap[Long]()

  override def update(buffer: scala.collection.mutable.LongMap[Long],
                      input: InternalRow): scala.collection.mutable.LongMap[Long] = {
    val t = child.eval(input)
    if (t != null) {
      val cps = CharlmModel.codePoints(t.asInstanceOf[UTF8String])
      var i = 0
      while (i <= cps.length - 3) {
        val tri = (cps(i).toLong << 42) | (cps(i + 1).toLong << 21) | cps(i + 2).toLong
        buffer(tri) = buffer.getOrElse(tri, 0L) + 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: scala.collection.mutable.LongMap[Long],
                     other: scala.collection.mutable.LongMap[Long]): scala.collection.mutable.LongMap[Long] = {
    other.foreachEntry((k, v) => buffer(k) = buffer.getOrElse(k, 0L) + v)
    buffer
  }

  override def eval(buffer: scala.collection.mutable.LongMap[Long]): Any = {
    val out = new Array[Any](buffer.size)
    var i = 0
    buffer.foreachEntry { (k, v) =>
      out(i) = new GenericInternalRow(Array[Any](CharlmModel.unpack(k), v))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buffer: scala.collection.mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    buffer.foreachEntry((k, v) => { bb.putLong(k); bb.putLong(v) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new scala.collection.mutable.LongMap[Long](n * 2)
    var i = 0
    while (i < n) { out.update(bb.getLong(), bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CharlmCountsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CharlmCountsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CharlmCountsAgg =
    copy(child = newChildren(0))
}

/** `graft_charlm_doc_score(model: binary literal, text, rareBelow:
  * double literal)` — the whole per-doc charlm score as ONE map-side
  * expression: `struct(n_tri, psum, rare_tri)` against a driver-held
  * serialized [[CharlmModel]].
  *
  * This is the scoring half of
  * [[graft.operators.TextOps.charlmScoreAgainstModel]] with the
  * trigram explode (`len-2` rows per doc), the per-doc rollup
  * shuffle, the two model joins and the per-doc fold aggregate all
  * collapsed into one pass over the doc's own trigrams — the join
  * path's dataflow priced per corpus row instead of per trigram
  * occurrence. The model rides the plan as a foldable binary literal
  * (the [[BloomMightContain]] convention) and deserializes once per
  * executor expression instance; the caller guards its size with a
  * row cap and falls back to the join path past it (a CJK-scale
  * alphabet blows any literal budget — same reasoning as the c3/c2
  * broadcast-hint refusal in the join path).
  *
  * Bit-exactness contract (spec-pinned against the join path): the
  * doc's DISTINCT trigrams fold in ascending unsigned-byte order —
  * `UTF8String.compareTo`, the exact order [[SortedFoldSumStr]] and
  * DuckDB's binary collation use — with `acc += n · P` where
  * `P = (C(abc)+1) / (C(ab)+S)` in the join path's own IEEE ops
  * (long→double casts, one add, one divide, one multiply). `n_tri`
  * and `rare_tri` are integer sums, order-free. Docs shorter than 3
  * chars return null (the join path drops them before the explode —
  * callers filter `length >= 3` first). */
case class CharlmDocScore(left: Expression, right: Expression, rareBelow: Double)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary serialized charlm model, got ${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a FOLDABLE model argument (a literal/driver-built model)")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string text argument, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("psum", DoubleType, nullable = false),
    StructField("rare_tri", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_charlm_doc_score"

  @transient private lazy val model: CharlmModel = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: model bytes are null")
    CharlmModel.deserialize(bytes)
  }

  /** Public scorer for codegen'd calls. Returns null for texts
    * shorter than 3 chars (no trigram positions). */
  def score(text: UTF8String): InternalRow = model.stats(text, rareBelow)

  override def nullSafeEval(modelBytes: Any, text: Any): Any =
    score(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCharlmScore", this, classOf[CharlmDocScore].getName)
    nullSafeCodeGen(ctx, ev, (_, text) => s"""
      ${ev.value} = $ref.score($text);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CharlmDocScore =
    copy(left = newLeft, right = newRight)
}

/** `graft_charlm_rare_frac(model: binary literal, text, rareBelow:
  * double literal)` — the charlm QUALITY GATE's decision value
  * `rare_tri / n_tri` as one double, ONE per-doc pass.
  *
  * Exists because the gate's natural declarative form —
  * `score.filter(rare_tri / n_tri > maxFrac)` over [[CharlmDocScore]]
  * — triple-evaluates the scorer: predicate pushdown substitutes the
  * struct expression into each field reference and filter codegen has
  * no common-subexpression elimination (measured 3 plan occurrences,
  * 3.65 s vs 1.9 s single-pass at sf0.1). A predicate built on THIS
  * expression evaluates the doc exactly once. The division is the
  * exact IEEE op the scored form computes (`rare_tri.toDouble /
  * n_tri.toDouble`), so a gate on it replays bit-identically in the
  * oracle's `rare_frac` CTE. Null (dropped by a filter, i.e. KEPT by
  * the gate's drop-set semantics) for texts shorter than 3 chars —
  * the join path's scored frame never contains those docs either. */
case class CharlmRareFrac(left: Expression, right: Expression, rareBelow: Double)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary serialized charlm model, got ${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a FOLDABLE model argument (a literal/driver-built model)")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string text argument, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_charlm_rare_frac"

  @transient private lazy val model: CharlmModel = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: model bytes are null")
    CharlmModel.deserialize(bytes)
  }

  /** Boxed for codegen (null = no trigram positions). */
  def rareFrac(text: UTF8String): java.lang.Double = {
    val s = model.stats(text, rareBelow)
    if (s == null) null
    else java.lang.Double.valueOf(
      s.getLong(2).toDouble / s.getLong(0).toDouble)
  }

  override def nullSafeEval(modelBytes: Any, text: Any): Any =
    rareFrac(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCharlmRareFrac", this, classOf[CharlmRareFrac].getName)
    val boxed = ctx.freshName("boxedFrac")
    nullSafeCodeGen(ctx, ev, (_, text) => s"""
      java.lang.Double $boxed = $ref.rareFrac($text);
      ${ev.isNull} = ($boxed == null);
      ${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CharlmRareFrac =
    copy(left = newLeft, right = newRight)
}
