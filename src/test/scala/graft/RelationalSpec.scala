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

  test("forecastRevenue: discount band inclusive, quantity and end-date strict") {
    val lineitem = Seq(
      ("1996-06-01", 0.05, 10.0, 100.0), // both band edges inclusive
      ("1996-06-01", 0.07, 23.0, 100.0),
      ("1996-06-01", 0.06, 24.0, 100.0), // qty == cap -> excluded (strict <)
      ("1997-01-01", 0.06, 10.0, 100.0), // end date exclusive
      ("1996-06-01", 0.04, 10.0, 100.0)) // below the band
      .toDF("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val rev = Relational.forecastRevenue(lineitem)
      .as[Double].collect().head
    assert(rev === 100.0 * 0.05 + 100.0 * 0.07)
  }

  test("volumeShipping: same-nation flows drop, directions stay separate rows") {
    val nation = Seq((1L, "NATION_1"), (2L, "NATION_2"), (3L, "NATION_3"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 1L), (20L, 2L), (30L, 3L))
      .toDF("s_suppkey", "s_nationkey")
    val customer = Seq((100L, 1L), (200L, 2L)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((1000L, 100L), (2000L, 200L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (2000L, 10L, "1996-05-01", 100.0, 0.0), // N1 supp -> N2 cust
      (1000L, 20L, "1997-05-01", 200.0, 0.0), // N2 supp -> N1 cust
      (1000L, 10L, "1996-05-01", 999.0, 0.0), // N1 -> N1: same nation, drops
      (2000L, 30L, "1996-05-01", 999.0, 0.0)) // N3 supplier: outside the pair
      .toDF("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val out = Relational.volumeShipping(supplier, lineitem, orders, customer, nation)
      .select("supp_nation", "cust_nation", "l_year", "revenue")
      .as[(String, String, Int, Double)].collect().toSet
    assert(out === Set(
      ("NATION_1", "NATION_2", 1996, 100.0),
      ("NATION_2", "NATION_1", 1997, 200.0)))
  }

  test("topSupplier: exact decimal equality surfaces ALL tied maxima") {
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val lineitem = Seq(
      // suppliers 1 and 2 tie exactly (decimal accumulation — no
      // float drift can break the tie); supplier 3 trails
      (1L, "1996-02-01", 100.10, 0.0), (1L, "1996-02-02", 50.20, 0.0),
      (2L, "1996-02-01", 150.30, 0.0),
      (3L, "1996-02-01", 10.0, 0.0),
      (1L, "1996-05-01", 999.0, 0.0)) // outside the window
      .toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val out = Relational.topSupplier(supplier, lineitem)
      .select("s_suppkey", "s_name", "total_revenue")
      .as[(Long, String, Double)].collect()
    assert(out.toSeq === Seq((1L, "s1", 150.30), (2L, "s2", 150.30)))
  }

  test("smallQtyYearlyRevenue: the 20%-of-average bar is strict and per-part") {
    val part = Seq((10L, "Brand#12"), (20L, "Brand#12"), (30L, "Brand#99"))
      .toDF("p_partkey", "p_brand")
    val lineitem = Seq(
      // part 10: qtys 1,1,1,1,46 -> sum 50, cnt 5; bar: 5*qty*5 < 50
      // i.e. qty < 2 -> the four 1s qualify, 46 doesn't
      (10L, 1.0, 70.0), (10L, 1.0, 70.0), (10L, 1.0, 70.0), (10L, 1.0, 70.0),
      (10L, 46.0, 999.0),
      // part 20: qty 2 with sum 10, cnt 1 -> 5*2*1 = 10, NOT < 10:
      // exactly 0.2*avg sits ON the bar and is excluded
      (20L, 2.0, 555.0),
      // part 30: wrong brand — its tiny qtys must not leak in
      (30L, 1.0, 777.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val out = Relational.smallQtyYearlyRevenue(lineitem, part)
      .as[Double].collect().head
    assert(out === 4 * 70.0 / 7.0)
  }

  test("discountedRevenue: bands bind brand, size and quantity together") {
    val part = Seq(
      (10L, "Brand#12", 3), // in band 1
      (20L, "Brand#12", 8), // size outside band 1 (and not a band-2/3 brand)
      (30L, "Brand#23", 8), // in band 2
      (40L, "Brand#77", 3)) // brand outside every band
      .toDF("p_partkey", "p_brand", "p_size")
    val lineitem = Seq(
      (10L, 5.0, 100.0, 0.0),  // band 1: qty 1-11 ✓
      (10L, 20.0, 999.0, 0.0), // brand/size of band 1, qty of band 3 -> drops
      (20L, 5.0, 999.0, 0.0),  // size 8 disqualifies Brand#12
      (30L, 15.0, 200.0, 0.0), // band 2: qty 10-20 ✓
      (40L, 5.0, 999.0, 0.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val out = Relational.discountedRevenue(lineitem, part).as[Double].collect().head
    assert(out === 300.0)
  }

  test("idleCustomers: strict above-average bar, negative balances out of the mean, anti-join drops purchasers") {
    // positive balances: 100, 225, 300, 275 -> avg 225
    val customer = Seq(
      (1L, 100.0, "SEG_A"),  // below avg
      (2L, 225.0, "SEG_A"),  // exactly avg -> excluded (strict >)
      (3L, 300.0, "SEG_A"),  // above avg, no orders -> kept
      (4L, 275.0, "SEG_B"),  // above avg but HAS an order -> anti-joined away
      (5L, -50.0, "SEG_B"))  // negative: out of the average AND below it
      .toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val orders = Seq((900L, 4L)).toDF("o_orderkey", "o_custkey")
    val out = Relational.idleCustomers(customer, orders)
      .select("c_mktsegment", "numcust", "totacctbal")
      .as[(String, Long, Double)].collect()
    // customers 3 and 4 beat the 225 average, 4 has an order ->
    // only customer 3 survives
    assert(out.toSeq === Seq(("SEG_A", 1L, 300.0)))
  }
}
