package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** All ordered index pairs (i < j) of a bounded posting list in ONE
  * native pass: `[a, b, c]` → `[(a,b), (a,c), (b,c)]` — the pair
  * explode of every bounded-collect co-occurrence chain
  * (ngram-Jaccard, CDC substring). The declarative twin
  * (`flatten(transform(ds, (a, i) => transform(slice(ds, i+2, n), b =>
  * struct(a, b))))`) allocates a SLICED COPY of the tail per element —
  * O(|ds|²) array allocations per posting row plus an interpreted
  * lambda bind per pair — measured as the dominant term of the pair
  * chain (1.46 s of dedup_ngram_jaccard's 2.25 s at sf0.1). Here it is
  * one preallocated output array. Pair content and order are
  * IDENTICAL, so every downstream aggregate sees the same rows.
  *
  * Input must be a (df-capped) bounded list — output size is
  * n(n−1)/2, i.e. ≤ 4950 structs at the standard maxDocFreq=100 cap.
  * Null input → null; null elements → null (the HOF form would emit
  * null-field structs — callers' posting lists are sort_array outputs
  * of non-null collects, which cannot contain nulls). */
case class PairCombos(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d1", LongType, nullable = false),
    StructField("d2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_pair_combos"

  /** Public entry for codegen'd calls — the BloomProbe convention:
    * doGenCode references this instance so the Generate/projection
    * around the pair explode stays inside whole-stage codegen instead
    * of the CodegenFallback trait ejecting the operator (r20 verdict
    * #3). */
  def pairs(a: ArrayData): Any = nullSafeEval(a)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPairCombos", this, classOf[PairCombos].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.pairs($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }

  override def nullSafeEval(a: Any): Any = {
    val ds = a.asInstanceOf[ArrayData]
    val n = ds.numElements()
    var i = 0
    while (i < n) { if (ds.isNullAt(i)) return null; i += 1 }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      val d1 = ds.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](d1, ds.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)
}
