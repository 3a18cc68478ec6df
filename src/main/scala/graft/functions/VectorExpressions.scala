package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

private object VectorExpressions {
  /** Accept array<double> OR array<float>: float widens to double
    * exactly, so taking floats directly is bit-identical to a
    * `transform(x, _.cast("double"))` pre-pass — minus one interpreted
    * HOF evaluation per row. */
  def isNumericArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Element accessor for interpreted eval. */
  def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case _ => (a, i) => a.getDouble(i)
  }

  /** Element accessor for generated code. */
  def genGetter(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }
}

/** Native Catalyst expressions for the vector hot path.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is semantically right
  * but interpreted: every element costs a lambda-variable bind and a
  * boxed eval. These expressions generate a tight primitive `for` loop
  * under whole-stage codegen (`doGenCode`), with an interpreted
  * `nullSafeEval` fallback that folds in the SAME left-to-right order —
  * so results are bit-identical between modes, partitionings, and the
  * HOF formulation they replace (the DuckDB oracles are unchanged).
  *
  * Null semantics also mirror the HOF form exactly: length-mismatched
  * inputs (zip_with would pad with null) and null elements both yield
  * NULL — a ragged embedding surfaces as null, never as a silent
  * partial dot product.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExpressions.isNumericArray(left.dataType) &&
        VectorExpressions.isNumericArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double|float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val gx = VectorExpressions.getter(left.dataType)
    val gy = VectorExpressions.getter(right.dataType)
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += gx(x, i) * gy(y, i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val ga = VectorExpressions.genGetter(left.dataType, a, i)
      val gb = VectorExpressions.genGetter(right.dataType, b, i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $ga * $gb;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** L2 norm with the same sequential Σx² fold as the HOF form. */
case class L2Norm(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExpressions.isNumericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<double|float> argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val g = VectorExpressions.getter(child.dataType)
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = g(x, i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val ga = VectorExpressions.genGetter(child.dataType, a, i)
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = $ga;
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($s); }
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}
