package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_might_contain(bloom: binary, value: string)` — probe a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] (the
  * public sketch Spark's own runtime row-level bloom join family
  * uses) against a string key.
  *
  * Purpose-built for the incremental ingest's EXACT-dup prefilter
  * ([[graft.Pipeline.runIncremental]]): an anti-join against the
  * corpus hash set must touch the join machinery for every delta
  * row, but a bloom answers "definitely NOT in the corpus" map-side
  * — and bloom filters have NO false negatives, so the definite-new
  * rows can skip the join entirely while only the "maybe" sliver
  * (false-positive rate × delta + true duplicates) proceeds to the
  * exact check. Spark's zero-code variant (InjectRuntimeFilter) is
  * deliberately NOT relied on: runtime bloom pruning of the probe
  * side is unsound for LEFT ANTI join (pruned rows are exactly the
  * rows an anti-join must KEEP), so Spark never injects one there —
  * the union-bypass shape this expression enables is the correct
  * form, and [[graft.operators.Corpus.bloomFilterAudit]] is the
  * registered contract row licensing it.
  *
  * The filter arrives as a FOLDABLE binary (the driver-held
  * serialized sketch embedded as a literal, shipped with the plan
  * like any broadcast scalar) and deserializes ONCE per executor
  * expression instance, not per row. Deterministic, null-safe
  * (null value → null, the standard binary-expression contract),
  * codegen-friendly: `doGenCode` references the deserialized filter
  * object directly so the probe stays inside whole-stage codegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary serialized bloom filter, got ${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a FOLDABLE bloom argument (a literal/driver-built sketch)")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string probe value, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: bloom filter bytes are null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Public probe for codegen'd calls (doGenCode references this
    * expression instance and invokes it per row). */
  def mightContain(value: UTF8String): Boolean =
    filter.mightContainBinary(value.getBytes)

  override def nullSafeEval(bloomBytes: Any, value: Any): Any =
    mightContain(value.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (_, value) => s"${ev.value} = $ref.mightContain($value);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
