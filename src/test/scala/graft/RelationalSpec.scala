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

  test("bigQuantityOrders: HAVING bar is strict, top-N orders by price with key tiebreak") {
    val lineitem = Seq(
      // order 1: sums to exactly the bar -> excluded (strict >)
      (1L, 100.0), (1L, 150.0),
      // order 2: past the bar
      (2L, 200.0), (2L, 60.0),
      // order 3: past the bar, same totalprice as order 2
      (3L, 300.0),
      // order 4: below
      (4L, 10.0))
      .toDF("l_orderkey", "l_quantity")
    val orders = Seq(
      (1L, 7L, "1996-01-01", 500.0), (2L, 8L, "1996-02-01", 400.0),
      (3L, 8L, "1996-03-01", 400.0), (4L, 9L, "1996-04-01", 900.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val customer = Seq((7L, "c7"), (8L, "c8"), (9L, "c9"))
      .toDF("c_custkey", "c_name")
    val out = Relational.bigQuantityOrders(orders, lineitem, customer)
      .select("o_orderkey", "c_name", "total_qty")
      .as[(Long, String, Double)].collect()
    // orders 1 (== bar) and 4 (below) are out; 2 and 3 tie on price,
    // orderkey breaks the tie
    assert(out.toSeq === Seq((2L, "c8", 260.0), (3L, "c8", 300.0)))
  }
}
