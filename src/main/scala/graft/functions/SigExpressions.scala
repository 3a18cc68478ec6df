package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Map-only near-dup signatures.
  *
  * [[MinHashAgg]]/[[SimHashAgg]] compute fingerprints as aggregates
  * over EXPLODED shingle rows — correct, but the explode multiplies
  * the corpus by ~|tokens| and the groupBy shuffles that multiple
  * before a single byte of signature exists. A document's fingerprint
  * is a pure function of its own shingle set, so these scalar twins
  * compute it in place during the scan: at 100 TB the fingerprint
  * stage becomes a map-only pass and the FIRST shuffle in the dedup
  * pipeline is the (tiny) banded-signature bucket join.
  *
  * Bit-for-bit identical to the aggregate path (spec-pinned): elements
  * are hashed exactly like Spark's `xxhash64(elem)` (XXH64, seed 42),
  * then re-mixed/voted with the same finalizers as the aggregates.
  * One behavioral seam: `explode` silently DROPS empty-shingle docs,
  * a scalar projection keeps every row — callers filter
  * `size(shingles) > 0` to preserve the pipeline semantics (an empty
  * set has no similarity signal; its all-MaxValue / all-zero
  * fingerprint would otherwise collide with every other empty doc).
  */
private[functions] object SigHash {
  /** Golden-ratio odd constant for per-permutation / per-plane seeds. */
  val Golden = 0x9e3779b97f4a7c15L

  /** Murmur3 finalizer — THE mixing function of the signature family.
    * [[MinHashAgg]] and [[SrpBuckets]] delegate here: the scalar and
    * aggregate fingerprints are contractually bit-identical, so there
    * must be exactly one copy of this function to diverge from. */
  def mix(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** Same value as the `xxhash64(col)` Catalyst expression. */
  def elementHash(s: AnyRef): Long = XxHash64Function.hash(s, StringType, 42L)

  def checkStringArray(prettyName: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> shingle argument, got ${other.simpleString}")
  }
}

/** Scalar MinHash signature: `graft_minhash_sig(shingles, n)` ==
  * `graft_minhash(xxhash64(shingle), n)` aggregated over the exploded
  * shingles (for non-empty shingle sets). */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1 && numHashes <= 1024)

  override def checkInputDataTypes(): TypeCheckResult =
    SigHash.checkStringArray(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        val h = SigHash.elementHash(arr.getUTF8String(e))
        var i = 0
        while (i < numHashes) {
          val p = SigHash.mix(h + i * SigHash.Golden)
          if (p < sig(i)) sig(i) = p
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Scalar 64-bit SimHash fingerprint: `graft_simhash_sig(shingles)` ==
  * `graft_simhash(xxhash64(shingle))` aggregated over the exploded
  * shingles (for non-empty shingle sets). */
case class SimHashSig(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    SigHash.checkStringArray(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](64)
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        val h = SigHash.elementHash(arr.getUTF8String(e))
        var i = 0
        while (i < 64) {
          votes(i) += (((h >>> i) & 1L) << 1) - 1L
          i += 1
        }
      }
      e += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= 1L << i
      i += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
