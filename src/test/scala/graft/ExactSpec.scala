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
}
