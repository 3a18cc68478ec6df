package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The silver content-cleaning pipeline as ONE native expression.
  *
  * The chained `regexp_replace` form decodes UTF8String → String and
  * re-encodes on EVERY step — 9 round-trips per row on the flagship
  * path (silver/gold/search all sit on it). This expression decodes
  * once, runs the same 9 compiled patterns in order, and encodes once.
  *
  * Bit-for-bit identical to the Column chain (spec-pinned): same
  * `java.util.regex` engine and flags, replacements carry no `$`/`\`
  * specials (so `replaceAll` ≡ RegExpReplace's append loop), and the
  * final trim is `UTF8String.trim()` — Spark's space-only trim, NOT
  * `String.trim` (which would also strip the newlines step 7 already
  * collapsed).
  *
  * Steps come from the single source of truth
  * [[graft.operators.Cleaning.ContentSteps]], which also generates the
  * DuckDB oracle rendering — the three forms cannot drift.
  */
case class CleanContent(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_clean_content"

  @transient private lazy val compiled: Array[(Pattern, String)] =
    graft.operators.Cleaning.ContentSteps.map { case (p, r) => (Pattern.compile(p), r) }.toArray

  override def nullSafeEval(input: Any): Any = {
    var s = input.asInstanceOf[UTF8String].toString
    var i = 0
    while (i < compiled.length) {
      s = compiled(i)._1.matcher(s).replaceAll(compiled(i)._2)
      i += 1
    }
    UTF8String.fromString(s).trim()
  }

  override protected def withNewChildInternal(newChild: Expression): CleanContent =
    copy(child = newChild)
}
