package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton curve's defining properties, and the
  * physical layout contract of [[Layout.zOrdered]]. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue is a bijection on the masked domain and monotone per dimension") {
    val pairs = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val out = pairs.toDF("x", "y")
      .withColumn("zval", Layout.zValue(col("x"), col("y"), bits = 5))
      .as[(Long, Long, Long)].collect()
    // bijective on 32x32, and exactly the interleave-by-hand value
    assert(out.map(_._3).distinct.length === 1024)
    def interleave(x: Long, y: Long): Long =
      (0 until 5).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    out.foreach { case (x, y, z) => assert(z === interleave(x, y), s"($x, $y)") }
    // monotone in x with y fixed (same for y by symmetry of the form)
    val fixedY = out.filter(_._2 == 7L).sortBy(_._1).map(_._3)
    assert(fixedY.sameElements(fixedY.sorted))
  }

  test("zOrdered range-partitions the curve: per-partition zval ranges are disjoint and sorted") {
    val df = (0L until 512L).map(i => (i, i % 23L, i / 23L)).toDF("id", "x", "y")
    val parts = Layout.zOrdered(df, col("x"), col("y"), numFiles = 4, bits = 8)
      .select(spark_partition_id().as("pid"), col("zval"))
      .as[(Int, Long)].collect()
      .groupBy(_._1).map { case (pid, rows) => (pid, rows.map(_._2).toSeq) }
    // sorted within every partition
    parts.values.foreach(zs => assert(zs.sameElements(zs.sorted)))
    // partitions own disjoint curve segments: ranges do not overlap
    val ranges = parts.toSeq.sortBy(_._2.head).map { case (_, zs) => (zs.head, zs.last) }
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }
}
