package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_sharded_might_contain` — probe a hash-prefix-SHARDED set of
  * serialized [[org.apache.spark.util.sketch.BloomFilter]]s against a
  * lowercase-hex (md5) key: the key's first two hex chars pick the
  * shard (`[[ShardedBloomMightContain.shardOf]]`), and ONLY that
  * shard's filter is probed — one bloom probe per row, exactly like
  * the single-filter [[BloomMightContain]], just against 1/N of the
  * bits.
  *
  * Why this exists: the single-filter prefilter ships the serialized
  * bloom as a PLAN LITERAL — a broadcast-scale driver value that is
  * the right shape up to the sizing note's ceiling (~0.9 GB at 1 B
  * hashes, fpp 0.03) and the wrong one past it (a single byte array
  * marching toward the JVM's 2 GB limit, re-shipped inside every
  * plan that references it). The sharded form splits the corpus
  * bloom into N prefix-sharded filters delivered via a REAL Spark
  * [[Broadcast]]: torrent-distributed in 4 MB blocks, fetched once
  * per executor (not once per plan), spilled to disk under pressure,
  * and with no single array anywhere near the JVM ceiling. The
  * expression carries only the broadcast HANDLE (bytes on the wire:
  * an id), so the plan stays small no matter how large the corpus
  * bloom grows.
  *
  * Missing shards are represented as EMPTY byte arrays and probe
  * `false` — "no filter" for a shard means no member hash ever
  * landed there, so every probe of that shard is definitely new
  * (the no-false-negatives contract is preserved shard-wise:
  * [[graft.operators.Dedup.writeHashBloomSharded]] only omits a
  * shard when zero member hashes map to it).
  *
  * Null-safe (null key → null), deterministic, codegen'd the same
  * way as [[BloomMightContain]]: `doGenCode` references this
  * expression instance, the filters deserialize once per executor
  * expression instance, and the probe stays inside whole-stage
  * codegen. */
case class ShardedBloomMightContain(blooms: Broadcast[Array[Array[Byte]]],
                                    child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a lowercase-hex string probe value, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sharded_might_contain"

  @transient private lazy val filters: Array[BloomFilter] = {
    val shards = blooms.value
    require(shards != null && shards.nonEmpty, s"$prettyName: empty shard array")
    shards.map { bytes =>
      if (bytes == null || bytes.isEmpty) null // empty shard: no members
      else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    }
  }

  /** Public probe for codegen'd calls. */
  def mightContain(value: UTF8String): Boolean = {
    val f = filters(ShardedBloomMightContain.shardOf(value, filters.length))
    f != null && f.mightContainBinary(value.getBytes)
  }

  override def nullSafeEval(value: Any): Any =
    mightContain(value.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftShardedBloomProbe", this,
      classOf[ShardedBloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, value => s"${ev.value} = $ref.mightContain($value);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShardedBloomMightContain =
    copy(child = newChild)
}

object ShardedBloomMightContain {
  /** Shard assignment: the key's first two lowercase-hex chars as an
    * integer, mod the shard count — uniform for md5 keys, and
    * REPLAYED IN SQL by [[graft.operators.Dedup.shardOfCol]]
    * (`conv(substring(key, 1, 2), 16, 10) % n`); the two MUST agree
    * or build-side and probe-side shards diverge (spec-pinned). */
  def shardOf(value: UTF8String, n: Int): Int = {
    // allocation-free: this runs once per row inside whole-stage
    // codegen for every prefiltered arm — a String + substring copy
    // of a 32-char key per probe is GC pressure at exactly the scale
    // the sharded form exists for. Hex chars are single-byte UTF-8,
    // so the first two bytes ARE the prefix.
    if (value.numBytes() < 2)
      throw new IllegalArgumentException(
        s"sharded bloom key '${value.toString}' is shorter than the 2-hex-char shard prefix")
    val hi = Character.digit(value.getByte(0), 16)
    val lo = Character.digit(value.getByte(1), 16)
    if (hi < 0 || lo < 0)
      throw new NumberFormatException(
        s"sharded bloom key '${value.toString}' does not start with two hex chars")
    (hi * 16 + lo) % n
  }

  /** Column-API entry: the broadcast handle cannot flow through a SQL
    * function registration (builders only see child Expressions), so
    * the probe column is constructed directly from the expression. */
  def probe(blooms: Broadcast[Array[Array[Byte]]],
            key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ShardedBloomMightContain(blooms,
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(key)))
}
