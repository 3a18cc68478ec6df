package graft

import graft.functions.Exact
import org.apache.spark.sql.functions._

/** The exact-aggregation helpers exist for ONE property: the result
  * must not depend on how the data is partitioned — plain double sums
  * do (IEEE addition is not associative), decimal accumulation does
  * not. This pins it. */
class ExactSpec extends SparkSpec {
  import spark.implicits._

  // values chosen so naive double summation order visibly matters
  private val values = (1 to 2000).map(i => (i.toLong, (math.Pi * i * 0.01) % 97))

  test("sumFixed / avgFixed are identical across partitionings") {
    def run(partitions: Int): (Double, Double) = {
      val df = values.toDF("id", "v").repartition(partitions)
      val r = df.agg(Exact.sumFixed(col("v")).as("s"), Exact.avgFixed(col("v")).as("a")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val runs = Seq(1, 3, 17, 32).map(run)
    assert(runs.distinct.size === 1) // exact bit equality, not approx
  }

  test("sumFixed rounds the input to the declared scale exactly") {
    val df = Seq(0.015, 0.025).toDF("v") // classic half-even traps
    val s = df.agg(Exact.sumFixed(col("v"), 2)).head().getDouble(0)
    assert(math.abs(s - 0.05) < 1e-12)
  }

  test("graft_sorted_fold_sum(_str) are bit-identical to the declarative sorted fold") {
    GraftExtensions.register(spark)
    // double values whose summation order visibly matters, keys that
    // exercise byte-order vs UTF-16 order (non-ASCII above and below
    // the surrogate range) and long keys out of insertion order
    val rows = (1 to 800).map { i =>
      val key = if (i % 3 == 0) s"\u00e9$i" else if (i % 3 == 1) s"\u4e2d$i" else s"a$i"
      (i % 7L, key, i.toLong * 1001L, (math.E * i * 0.013) % 89)
    }
    val df = rows.toDF("g", "ks", "kl", "x").repartition(13)
    val declStr = df.groupBy(col("g")).agg(
      aggregate(array_sort(collect_list(struct(col("ks"), col("x")))),
        lit(0.0), (acc, p) => acc + p.getField("x")).as("s"))
      .as[(Long, Double)].collect().toMap
    val natStr = df.groupBy(col("g")).agg(
      call_function("graft_sorted_fold_sum_str", col("ks"), col("x")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(declStr === natStr) // exact double equality
    val declLong = df.groupBy(col("g")).agg(
      aggregate(array_sort(collect_list(struct(col("kl"), col("x")))),
        lit(0.0), (acc, p) => acc + p.getField("x")).as("s"))
      .as[(Long, Double)].collect().toMap
    val natLong = df.groupBy(col("g")).agg(
      call_function("graft_sorted_fold_sum", col("kl"), col("x")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(declLong === natLong)
  }
}
