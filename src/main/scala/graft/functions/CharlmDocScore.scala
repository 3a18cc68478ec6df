package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
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
      // addTo, not put: distinct model rows normally have distinct
      // packed keys, but malformed-UTF-8 byte trigrams can COLLAPSE
      // to one key — summing keeps C(ab) == Σ_c C(abc) consistent
      // either way (an overwrite would break the derived-denominator
      // invariant exactly on the collapsed keys)
      c3.addTo(packed(i), counts(i))
      c2.addTo(packed(i) >>> 21, counts(i))
      thirdChars.add(java.lang.Long.valueOf(packed(i) & 0x1FFFFFL))
      i += 1
    }
  }

  /** Alphabet size: distinct third-position chars across the model —
    * `countDistinct(substring(tri, 3, 1))`, as a double for the
    * smoothing denominator. */
  val alphabet: Double = thirdChars.size().toDouble

  /** One doc's `(n_tri, psum, rare_tri)` — [[CharlmDocScore]]'s
    * per-doc pass. Null for texts shorter than 3 chars (no trigram
    * positions — the join path drops them before its explode). */
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

  /** Tiny process-wide LRU of deserialized models, keyed by wire-byte
    * content. Spark deserializes the codegen reference array PER
    * TASK, so an expression-instance `lazy val` alone would rebuild
    * the model's hash maps (up to ~1M-entry at the cap) for every
    * task of every micro-batch; this pays it once per executor per
    * model GENERATION. Four slots: a process serves at most a couple
    * of live models (today's and a mid-swap predecessor) — bounded so
    * daily model turnover can never accumulate in a long-lived
    * executor. Bounded by estimated RETAINED heap, not slot count: a
    * cap-sized model's deserialized maps + alphabet set retain an
    * order of magnitude more heap than its ~20 MB wire form, so four
    * slots of slot-count LRU could pin ~1.6 GB per executor — the
    * byte budget keeps the worst case at `cacheBudgetBytes` while
    * still holding several small daily models. */
  private final class BytesKey(val bytes: Array[Byte]) {
    // cheap digest: length + 64 sampled bytes — a full
    // Arrays.hashCode would re-walk the ~20 MB wire bytes on EVERY
    // cache probe; equals (full compare) runs only on digest match
    override val hashCode: Int = {
      var h = bytes.length
      if (bytes.length > 0) {
        val step = math.max(1, bytes.length / 64)
        var i = 0
        while (i < bytes.length) { h = h * 31 + bytes(i); i += step }
      }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case k: BytesKey => java.util.Arrays.equals(bytes, k.bytes)
      case _ => false
    }
  }

  /** ~16× wire size: each ~20 B wire row expands to two open-address
    * map slots at ≤50% load (64 B) plus a boxed alphabet-set entry —
    * a deliberate overestimate so the budget errs toward eviction. */
  private def retainedEstimate(wire: Int): Long = wire.toLong * 16L

  private val cacheBudgetBytes: Long =
    java.lang.Long.getLong("graft.charlm.cacheBudgetBytes", 512L << 20)
  private var cachedBytesTotal = 0L
  private val cache =
    new java.util.LinkedHashMap[BytesKey, CharlmModel](8, 0.75f, true)

  def cached(bytes: Array[Byte]): CharlmModel = cache.synchronized {
    val k = new BytesKey(bytes)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val m = deserialize(bytes)
      cache.put(k, m)
      cachedBytesTotal += retainedEstimate(bytes.length)
      // evict eldest until under budget; always keep the newest (a
      // single over-budget model must still cache — rebuilding it per
      // task is the failure mode this cache exists to prevent)
      val it = cache.entrySet().iterator()
      while (cachedBytesTotal > cacheBudgetBytes && cache.size() > 1) {
        val e = it.next()
        cachedBytesTotal -= retainedEstimate(e.getKey.bytes.length)
        it.remove()
      }
      m
    }
  }

  /** UTF-8 code points of a string, stepping by
    * [[UTF8String.numBytesForFirstByte]] — the exact char boundaries
    * `numChars`/`substringSQL` walk, so char COUNT and char IDENTITY
    * always agree with the join path's `substring` semantics. Valid
    * UTF-8 decodes to true code points (≤ 21 bits); a malformed or
    * truncated head byte decodes deterministically from whatever
    * bytes its length class claims.
    *
    * VALID-UTF-8-ONLY bit-exactness: a stray lead/continuation byte
    * decodes to its raw value 0x80–0xFF, which COLLIDES with the real
    * code points U+0080–U+00FF — so on invalid UTF-8 two byte-distinct
    * trigrams can collapse to one packed key, and the packed sort
    * order no longer equals raw byte order (a standalone 0x80 byte
    * sorts before U+0080's 0xC2 0x80 encoding bytewise; no code-point
    * remap can fix the ORDER half, which is why this is documented
    * rather than patched). [[CharlmModel]] keeps the derived
    * denominators consistent under collapse (addTo on both tables,
    * `C(ab) = Σ_c C(abc)` holds), so scoring stays well-defined — but
    * the fast-path == join-path bit-exactness contract, and fast-path
    * == native-training key identity, are pinned for valid UTF-8
    * corpora only. */
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
    val size = 4L + rows.iterator.map(r => r._1.length.toLong + 12L).sum
    require(size <= Int.MaxValue,
      s"charlm model wire size $size exceeds a byte array — raise the caller's row cap guard, not this")
    val bb = ByteBuffer.allocate(size.toInt)
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

/** `graft_charlm_doc_counts(text)` — ONE doc's distinct trigrams
  * with multiplicities, packed: `array<struct<tri: bigint, n:
  * bigint>>`. The charlm TRAINING projection: the raw explode form
  * pushed `len-2` UTF8String rows per doc through the aggregate
  * machinery; this emits the doc's distinct-trigram rollup as packed
  * longs (no string allocation per position), and the caller's
  * ordinary `groupBy(tri).sum(n)` merges — DISTRIBUTED, partial-agg
  * bounded at |Σ|³ per task, no single-reducer funnel and no
  * corpus-sized rows at ANY realized alphabet (a global typed
  * aggregate here would merge every partition's map on one task —
  * exactly the CJK-scale corpora the join-path fallback exists
  * for). Counts are exact integers; [[CharlmUnpack]] recovers the
  * trigram strings on the |Σ|³-bounded AGGREGATED rows only. */
case class CharlmDocCounts(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tri", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_charlm_doc_counts"

  override def nullSafeEval(input: Any): Any = {
    val cps = CharlmModel.codePoints(input.asInstanceOf[UTF8String])
    val n = cps.length
    if (n < 3) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val m = n - 2
    val tris = new Array[Long](m)
    var i = 0
    while (i < m) {
      tris(i) = (cps(i).toLong << 42) | (cps(i + 1).toLong << 21) | cps(i + 2).toLong
      i += 1
    }
    java.util.Arrays.sort(tris)
    var distinct = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && tris(j) == tris(i)) j += 1
      distinct += 1
      i = j
    }
    val out = new Array[Any](distinct)
    var d = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && tris(j) == tris(i)) j += 1
      out(d) = new GenericInternalRow(Array[Any](tris(i), (j - i).toLong))
      d += 1
      i = j
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharlmDocCounts =
    copy(child = newChild)
}

/** `graft_charlm_unpack(tri: bigint)` — packed trigram back to its
  * 3-char string ([[CharlmModel.unpack]]). Runs only on the
  * |Σ|³-bounded aggregated rows, never per position. */
case class CharlmUnpack(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint packed trigram, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_charlm_unpack"

  override def nullSafeEval(input: Any): Any =
    CharlmModel.unpack(input.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): CharlmUnpack =
    copy(child = newChild)
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
    // per-process cache: the codegen reference array deserializes per
    // TASK, so a plain deserialize here would rebuild the maps for
    // every task of every micro-batch
    CharlmModel.cached(bytes)
  }

  /** Public scorer for codegen'd calls. Returns null for texts
    * shorter than 3 chars (no trigram positions). */
  def score(text: UTF8String): GenericInternalRow = model.stats(text, rareBelow)

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
