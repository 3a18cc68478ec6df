package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-token shingles of a space-tokenized string, as one
  * native expression.
  *
  * The declarative form —
  * `array_distinct(transform(sequence(0, size(w)-k), i -> concat_ws(" ", w[i+1], …)))`
  * — evaluates a four-level interpreted HOF tree per shingle (~13 µs
  * each measured); this is a single pass with a hash set (~one JVM
  * call per row). It feeds all three near-dup operators, where
  * shingling dominated the profile. `CodegenFallback` is fine here:
  * the HOF tree it replaces was never codegen'd either.
  *
  * Semantics are pinned by a property spec against the HOF form:
  * split on single spaces keeping empties (Spark `split(text, " ")`),
  * shingles joined by one space, distinct set, docs shorter than k
  * tokens yield an empty array.
  */
case class Shingles(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= words.length - k) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size())))
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** All character k-grams of a string (NON-distinct — the char-LM
  * scorer counts multiplicities), one native pass:
  * `graft_char_ngrams(text, k)` == the HOF form
  * `transform(sequence(1, length(text) - k + 1), i -> substring(text, i, k))`
  * (and an empty array when the text is shorter than k — the HOF form
  * would need a length guard because ANSI `sequence(1, 0)` DESCENDS).
  * The HOF tree evaluates interpreted per position; on the charlm
  * rows the trigram extraction dominated the profile the same way
  * token shingling did before [[Shingles]]. Positions are CHARACTER
  * indices (matching both engines' `substring`/`substr`), so the
  * replacement is bit-identical to the oracle's `substr(text, i, k)`
  * — spec-pinned against the HOF form. */
case class CharNgrams(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"ngram size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    // UTF8String.substringSQL counts CHARACTERS like the SQL function —
    // byte slicing would break on multi-byte text
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = s.substringSQL(i + 1, k)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}
