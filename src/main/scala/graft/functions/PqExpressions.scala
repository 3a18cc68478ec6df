package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native expressions for the PQ hot path (r20).
  *
  * The declarative PQ encode — explode each vector into m (vec, sub)
  * rows, broadcast-join the codebook on `sub`, score every cell with
  * interpreted `zip_with`/`aggregate` HOFs, `array_sort` the (d², cell)
  * structs, then SHUFFLE a corpus-wide groupBy(vec_id) to reassemble
  * the code array — is semantically right but pays a lambda bind and a
  * struct allocation per (cell, element) per row plus one corpus
  * exchange per encode pass. [[PqEncode]] fuses the whole thing into
  * ONE expression over the raw embedding: all m subspace argmins in a
  * tight primitive loop, codes/d²s/Σd² emitted together, zero shuffle
  * anywhere (the codebook rides a one-row broadcast).
  *
  * Bit-exactness contract (the oracle replays these): the per-cell
  * distance is the same left-to-right `0.0 + (x₁−c₁)² + (x₂−c₂)² + …`
  * fold as the `l2sq` HOF; the argmin orders by (d², cell) ascending
  * via `java.lang.Double.compare` — exactly the struct ordering
  * `element_at(array_sort(scored), 1)` used; `qerr` folds the m
  * subspace d²s in subspace order from 0.0 — exactly the
  * `graft_sorted_fold_sum(sub, d2)` it replaces. Float embeddings
  * widen exactly, as everywhere in this family.
  */
case class PqEncode(left: Expression, right: Expression)
  extends BinaryExpression {

  // subcents: array (by subspace, ascending) of array<struct<cell:
  // long, cemb: array<double|float>>> — the one-row packed layout
  // queryTables already broadcasts.
  private def cembType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(ArrayType(st: StructType, _), _) if st.length == 2 =>
      (st(0).dataType, st(1).dataType) match {
        case (LongType, t) if VectorExpressions.isNumericArray(t) => Some(t)
        case _ => None
      }
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExpressions.isNumericArray(left.dataType) && cembType(right.dataType).nonEmpty)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double|float>, array<array<struct<cell: bigint, " +
        s"cemb: array<double|float>>>>), got ${left.dataType.simpleString} and " +
        s"${right.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("d2s", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("qerr", DoubleType, nullable = false)))
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val ge = VectorExpressions.getter(left.dataType)
  @transient private lazy val gc = VectorExpressions.getter(cembType(right.dataType).get)

  /** Public entry for codegen'd calls (doGenCode references this
    * expression instance and invokes it per row — the BloomProbe
    * convention: the loop body stays this one interpreted method, but
    * the PROJECTION around it stays inside whole-stage codegen instead
    * of the CodegenFallback trait kicking the whole operator out of
    * the span, r20 verdict #3). */
  def encode(a: ArrayData, b: ArrayData): Any = nullSafeEval(a, b)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.encode($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
       """.stripMargin
    })
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val subcents = b.asInstanceOf[ArrayData]
    val n = emb.numElements()
    val m = subcents.numElements()
    if (m == 0) return null
    val codes = new Array[Long](m)
    val d2s = new Array[Double](m)
    var qerr = 0.0
    var off = 0
    var j = 0
    while (j < m) {
      if (subcents.isNullAt(j)) return null
      val cents = subcents.getArray(j)
      val k = cents.numElements()
      if (k == 0) return null
      var found = false
      var bestD2 = 0.0
      var bestCell = 0L
      var subDims = -1
      var c = 0
      while (c < k) {
        if (cents.isNullAt(c)) return null
        val st = cents.getStruct(c, 2)
        if (st.isNullAt(0) || st.isNullAt(1)) return null
        val cell = st.getLong(0)
        val cemb = st.getArray(1)
        val dims = cemb.numElements()
        // all cells of one subspace must agree on its width, and the
        // subspaces must tile the embedding exactly — anything else is
        // a malformed codebook, surfaced as NULL like IvfArgmin does
        if (subDims == -1) {
          if (off + dims > n) return null
          subDims = dims
        } else if (dims != subDims) return null
        var s = 0.0
        var d = 0
        while (d < subDims) {
          if (emb.isNullAt(off + d) || cemb.isNullAt(d)) return null
          val diff = ge(emb, off + d) - gc(cemb, d)
          s += diff * diff
          d += 1
        }
        val cmp = if (found) java.lang.Double.compare(s, bestD2) else -1
        if (cmp < 0 || (cmp == 0 && cell < bestCell)) {
          bestD2 = s
          bestCell = cell
          found = true
        }
        c += 1
      }
      codes(j) = bestCell
      d2s(j) = bestD2
      qerr += bestD2
      off += subDims
      j += 1
    }
    if (off != n) return null
    new GenericInternalRow(Array[Any](
      new GenericArrayData(codes), new GenericArrayData(d2s), qerr))
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** ADC distance fused into one native pass: Σ_j dtab[j][codes[j]],
  * folded left-to-right in subspace order from 0.0 — bit-identical to
  * the `aggregate(zip_with(dtab, codes, element_at(t, c+1)), 0.0, +)`
  * HOF chain it replaces. This is the per-candidate cost of every ADC
  * scan (codes × queries rows), the same argument that made the
  * dot/norm pair native. Length mismatch or an out-of-range code
  * yields NULL (the HOF form's null-padding outcome). */
case class AdcDist(left: Expression, right: Expression)
  extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && (right.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<array<double>>, array<bigint>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_dist"

  /** Public entry for codegen'd calls (see [[PqEncode.encode]]). */
  def dist(a: ArrayData, b: ArrayData): Any = nullSafeEval(a, b)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAdcDist", this, classOf[AdcDist].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.dist($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
       """.stripMargin
    })
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val dtab = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = dtab.numElements()
    if (codes.numElements() != m) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      if (dtab.isNullAt(j) || codes.isNullAt(j)) return null
      val t = dtab.getArray(j)
      val c = codes.getLong(j)
      if (c < 0 || c >= t.numElements() || t.isNullAt(c.toInt)) return null
      s += t.getDouble(c.toInt)
      j += 1
    }
    s
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)
}

/** [[SortedFoldSum]]'s ARRAY-valued twin: sums `values` arrays
  * ELEMENTWISE over the group in ascending `key` order, starting from
  * 0.0 per position — bit-identical to exploding the array to
  * (pos, x) rows and running `graft_sorted_fold_sum(key, x)` per
  * (group, pos), because elementwise addition in the same key order
  * performs the identical IEEE additions per position. This is the
  * deterministic Lloyd re-center's aggregation collapsed from TWO
  * shuffle levels (group × pos partial folds, then group reassembly
  * via collect_list + array_sort) into ONE group-keyed exchange whose
  * rows are 1/dims as many (r20, guide §2.3/§2.4).
  *
  * Keys are unique per group in every caller (vec_id); with duplicate
  * keys ties break by lexicographic value order, keeping the fold
  * deterministic. Ragged arrays throw — a malformed re-center input
  * must fail loudly, not average a truncated dimension. */
case class SortedFoldSumArr(
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Array[Double])]] {

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_sorted_fold_sum_arr"

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && (value.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (key: bigint, value: array<double>), got " +
        s"(${key.dataType.simpleString}, ${value.dataType.simpleString})")

  override def createAggregationBuffer(): ArrayBuffer[(Long, Array[Double])] =
    new ArrayBuffer[(Long, Array[Double])](4)

  override def update(buffer: ArrayBuffer[(Long, Array[Double])],
                      input: InternalRow): ArrayBuffer[(Long, Array[Double])] = {
    val k = key.eval(input)
    val v = value.eval(input)
    if (k != null && v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val out = new Array[Double](arr.numElements())
      var i = 0
      while (i < out.length) {
        require(!arr.isNullAt(i), s"$prettyName: null element at $i")
        out(i) = arr.getDouble(i)
        i += 1
      }
      buffer += ((k.asInstanceOf[Long], out))
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[(Long, Array[Double])],
                     other: ArrayBuffer[(Long, Array[Double])]): ArrayBuffer[(Long, Array[Double])] = {
    buffer ++= other
    buffer
  }

  override def eval(buffer: ArrayBuffer[(Long, Array[Double])]): Any = {
    if (buffer.isEmpty) return null
    val arr = buffer.toArray
    java.util.Arrays.sort(arr, new java.util.Comparator[(Long, Array[Double])] {
      def compare(a: (Long, Array[Double]), b: (Long, Array[Double])): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) return c
        val x = a._2; val y = b._2
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          val d = java.lang.Double.compare(x(i), y(i))
          if (d != 0) return d
          i += 1
        }
        x.length - y.length
      }
    })
    val dims = arr(0)._2.length
    val acc = new Array[Double](dims)
    var i = 0
    while (i < arr.length) {
      val v = arr(i)._2
      require(v.length == dims,
        s"$prettyName: ragged arrays in one group (${v.length} vs $dims)")
      var d = 0
      while (d < dims) { acc(d) += v(d); d += 1 }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override def serialize(buffer: ArrayBuffer[(Long, Array[Double])]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.map(_._2.length * 8 + 12).sum)
    buffer.foreach { case (k, v) =>
      bb.putLong(k); bb.putInt(v.length)
      var i = 0
      while (i < v.length) { bb.putDouble(v(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Array[Double])] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[(Long, Array[Double])](4)
    while (bb.hasRemaining) {
      val k = bb.getLong()
      val len = bb.getInt()
      val v = new Array[Double](len)
      var i = 0
      while (i < len) { v(i) = bb.getDouble(); i += 1 }
      out += ((k, v))
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SortedFoldSumArr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SortedFoldSumArr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SortedFoldSumArr =
    copy(key = newChildren(0), value = newChildren(1))
}

/** The PRODUCTION (non-deterministic) twin of [[SortedFoldSumArr]]:
  * elementwise array sum with a running double[] buffer — map-side
  * combinable (the buffer IS the partial sum, merge is elementwise
  * add), so the shuffle carries one dims-length partial per (group ×
  * map task) exactly like the per-(pos) `sum(x)` rows it replaces,
  * just dims× fewer of them. Summation order is partition-dependent,
  * the documented production trade. Ragged arrays throw. */
case class FoldSumArr(
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_fold_sum_arr"

  override def checkInputDataTypes(): TypeCheckResult =
    value.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (value: array<double>), got ${other.simpleString}")
    }

  // zero-length = "no input yet" sentinel (real inputs are never
  // zero-dimensional vectors in any caller)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def addInto(acc: Array[Double], arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val out = if (acc.length == 0) new Array[Double](n) else acc
    require(out.length == n, s"$prettyName: ragged arrays in one group ($n vs ${out.length})")
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), s"$prettyName: null element at $i")
      out(i) += arr.getDouble(i)
      i += 1
    }
    out
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = value.eval(input)
    if (v == null) buffer else addInto(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.length == 0) return buffer
    if (buffer.length == 0) return other
    require(buffer.length == other.length,
      s"$prettyName: ragged partials (${other.length} vs ${buffer.length})")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FoldSumArr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FoldSumArr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FoldSumArr =
    copy(value = newChildren(0))
}
