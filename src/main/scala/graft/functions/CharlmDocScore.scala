package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The corpus char-trigram model as a compact executor-side object:
  * `tri -> C(abc)` plus the two DERIVED tables the smoothed formula
  * needs — `bi -> C(ab) = Σ_c C(abc)` and the alphabet size `S` =
  * distinct third-position chars. Both derivations are integer
  * aggregates over the trigram keys, computed at deserialization, so
  * they can never disagree with the serialized numerators (the same
  * single-table invariant [[graft.operators.TextOps.charlmScoreAgainstModel]]'s
  * join path keeps by deriving them in-plan).
  *
  * The wire format is the trigram table alone: `int count`, then per
  * row `int len | utf8 bytes | long c3`. A trigram is ≤ 3 code points
  * ≤ 12 UTF-8 bytes, so a 1M-trigram model serializes to ~20 MB —
  * the size the caller's row cap bounds before choosing this path. */
final class CharlmModel(val c3: java.util.HashMap[UTF8String, java.lang.Long]) {

  val c2: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](c3.size())
    val it = c3.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bi = e.getKey.substringSQL(1, 2)
      m.merge(bi, e.getValue, (a, b) => a + b)
    }
    m
  }

  /** Alphabet size: distinct third-position chars across the model —
    * `countDistinct(substring(tri, 3, 1))`, as a double for the
    * smoothing denominator. */
  val alphabet: Double = {
    val seen = new java.util.HashSet[UTF8String]()
    val it = c3.keySet().iterator()
    while (it.hasNext) seen.add(it.next().substringSQL(3, 1))
    seen.size().toDouble
  }
}

object CharlmModel {

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
    val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val k = new Array[Byte](len)
      bb.get(k)
      m.put(UTF8String.fromBytes(k), bb.getLong())
      i += 1
    }
    new CharlmModel(m)
  }
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
  def score(text: UTF8String): InternalRow = {
    val n = text.numChars()
    if (n < 3) return null
    val m = n - 2
    val tris = new Array[UTF8String](m)
    var i = 0
    while (i < m) { tris(i) = text.substringSQL(i + 1, 3); i += 1 }
    // sort once: run-length counting replaces the hash rollup AND
    // yields the deterministic ascending-byte fold order for free
    java.util.Arrays.sort(tris, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    var acc = 0.0
    var rare = 0L
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && tris(j).equals(tris(i))) j += 1
      val cnt = (j - i).toLong
      val tri = tris(i)
      val c3v = model.c3.get(tri)
      val c3d = if (c3v == null) 0.0 else c3v.longValue().toDouble
      val c2v = model.c2.get(tri.substringSQL(1, 2))
      val c2d = if (c2v == null) 0.0 else c2v.longValue().toDouble
      val p = (c3d + 1.0) / (c2d + model.alphabet)
      acc += cnt.toDouble * p
      if (p < rareBelow) rare += cnt
      i = j
    }
    new GenericInternalRow(Array[Any](m.toLong, acc, rare))
  }

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
