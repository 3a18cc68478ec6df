package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Value-level pins for the relational set's engine-portability
  * boundaries (the oracle gate covers full results; these pin the
  * specific edge rules that could silently diverge). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("promoRevenueByMonth: a month with no promo parts reports 0, never NULL") {
    val lineitem = Seq(
      // month 1996-01: one promo, one plain
      (1L, 10L, "1996-01-05", 100.0, 0.0),
      (2L, 20L, "1996-01-20", 50.0, 0.5),
      // month 1996-02: plain only — the NULL-vs-0 boundary
      (3L, 20L, "1996-02-10", 40.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val part = Seq((10L, "PROMO"), (20L, "STANDARD")).toDF("p_partkey", "p_type")
    val out = Relational.promoRevenueByMonth(lineitem, part)
      .select("month", "promo_revenue", "total_revenue", "promo_share")
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("1996-01") === (("1996-01", 100.0, 125.0, 0.8)))
    assert(out("1996-02") === (("1996-02", 0.0, 40.0, 0.0)))
  }
}
