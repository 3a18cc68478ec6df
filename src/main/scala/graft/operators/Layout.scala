package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * write-time file organization.
  *
  * At 100 TB, scan pruning is the difference between reading terabytes
  * and reading gigabytes: parquet readers skip whole files and row
  * groups whose column min/max stats exclude the predicate. A sort on
  * ONE column gives perfect pruning on that column and none on any
  * other; interleaving the bits of TWO (or more) key columns gives
  * every key useful locality — files cover small rectangles of the
  * (x, y) key space instead of thin full-width stripes, so predicates
  * on EITHER dimension prune (the classic Morton-curve layout,
  * Orenstein & Merrett 1984, used by every lakehouse OPTIMIZE
  * implementation).
  *
  * The z-value here is pure integer arithmetic GENERATED as a
  * declarative expression (a sum of masked shifts — codegen'd by
  * Spark, replayable verbatim in any SQL oracle): no UDF, no custom
  * expression needed for a fixed bit width.
  */
object Layout {

  /** Morton z-value of two non-negative dimensions, `bits` bits each
    * (interleaved x even positions, y odd): deterministic BIGINT,
    * monotone in each dimension with the other held fixed. Inputs are
    * masked to `bits` (callers bucket or modulo real keys down first —
    * 16 bits per dimension already separates 65k × 65k file
    * rectangles, far finer than any file count). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i) % 2L, 2 * i),
        shiftleft(shiftright(y.cast("long"), i) % 2L, 2 * i + 1))
    }
    terms.reduce(_ + _).as("zval")
  }

  /** The same masked-shift sum as [[zValue]] rendered as ANSI SQL over
    * column names — the oracle is GENERATED from the same loop, so the
    * two cannot drift. (`% 2` on a non-negative shifted value is the
    * bit test; `& 1` spelled as modulo keeps the expression in plain
    * arithmetic every engine parses.) */
  def zValueSql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31)
    (0 until bits).flatMap { i =>
      Seq(
        s"((($x >> $i) % 2) << ${2 * i})",
        s"((($y >> $i) % 2) << ${2 * i + 1})")
    }.mkString(" + ")
  }

  /** Z-ordered layout: range-partition by z-value (so each output file
    * owns one contiguous curve segment = one small key-space
    * rectangle), sort within partitions, ready to write. One range
    * exchange — the same shuffle count as any global sort — and the
    * pruning benefit accrues to every subsequent read. */
  def zOrdered(df: DataFrame, x: Column, y: Column,
               numFiles: Int, bits: Int = 16): DataFrame = {
    require(numFiles >= 1)
    df.withColumn("zval", zValue(x, y, bits))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
  }
}
