package graft.operators

import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational/statistics surface over the star schema — the analog of
  * the reference's PG statistics rollups (`/root/reference/services/
  * staging_pg.py:322-366`, `batch_pg.py:230-300`) expressed as
  * shuffle-minimal Spark plans.
  */
object Relational {

  /** TPC-H Q1-flavored pricing summary: one partial-agg pass over a
    * 2-predicate, 6-column pruned scan. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumFixed(col("l_quantity")).as("sum_qty"),
        sumFixed(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(30,4)"))
          .cast("double").as("sum_disc_price"),
        avgFixed(col("l_quantity")).as("avg_qty"),
        avgFixed(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** Revenue by region/nation: fact table joins two broadcast dims —
    * zero shuffle on the dim side at any scale. */
  def revenueByNation(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("order_count"),
        sumFixed(col("o_totalprice")).as("revenue"))

  /** Top-N customers by revenue: aggregate, take the top N FIRST
    * (TakeOrderedAndProject — N rows per partition, no full sort),
    * then broadcast the N-row result against the customer dim. The
    * alternative (join the full per-customer aggregate to `customer`,
    * then limit) shuffles |customers| rows to keep N — wrong at scale. */
  def topCustomers(orders: DataFrame, customer: DataFrame, n: Int = 10): DataFrame = {
    val topN = orders
      .groupBy(col("o_custkey"))
      .agg(
        sumFixed(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("order_count"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(n)
    broadcast(topN)
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("revenue"), col("order_count"), col("o_custkey").as("custkey"))
      .orderBy(col("revenue").desc, col("custkey"))
  }

  /** Shipping-priority revenue (TPC-H Q3 shape): the FACT-TO-FACT join
    * the star queries above never exercise — orders⋈lineitem is
    * big-by-big at any scale, so both sides carry their date filters
    * INTO the join (pushed to the scans, shrinking what shuffles) and
    * the segment-filtered customer side stays a semi-join-shaped
    * key projection the planner can broadcast when small and shuffle
    * when not (deliberately NOT forced: at 100 TB a 1/5 of customers
    * is not broadcastable, and the declarative form lets AQE decide
    * per run). Revenue accumulates exactly as decimal(30,4) — the same
    * cross-engine determinism as q_tpch_pricing — and the top-N rides
    * TakeOrderedAndProject with a key tiebreak. */
  def shippingPriority(orders: DataFrame, lineitem: DataFrame,
                       customer: DataFrame, segment: String = "BUILDING",
                       cutoff: String = "1998-01-01", n: Int = 10): DataFrame =
    customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
      .join(orders.filter(col("o_orderdate") < lit(cutoff)),
        col("c_custkey") === col("o_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"))
      .join(lineitem.filter(col("l_shipdate") > lit(cutoff)),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,4)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(n)

  /** Customers-per-order-count distribution (TPC-H Q13 shape): the
    * LEFT OUTER big-by-big join — zero-order customers must appear in
    * the c_count=0 bucket, which an inner join silently drops (the
    * classic reporting bug this query exists to catch). `count(col)`
    * skips the outer join's nulls, so no conditional is needed; the
    * second aggregate runs on the per-customer rollup (customer-
    * cardinality, not orders-cardinality), and the final distribution
    * is value-domain-bounded. All BIGINT — exact on any engine. */
  def customerOrderDistribution(orders: DataFrame, customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** Late-shipment order priorities (TPC-H Q4 shape): orders having AT
    * LEAST ONE lineitem shipped more than `lagDays` after the order
    * date, counted by priority — the EXISTS/semi-join form over two
    * fact tables, the one canonical join shape the rest of the
    * relational set doesn't exercise (inner SMJ, left-outer and anti
    * all have rows; this is the semi WITH a residual).
    *
    * Scale shape: a fact-to-fact LEFT SEMI sort-merge on the order
    * key — the probe side short-circuits on first match and emits at
    * most one row per order, so the join output is bounded by orders,
    * never by lineitems; the date comparison rides the join as a
    * residual (it references both sides, so no single-side pushdown
    * exists by construction). Neither side broadcasts — correct at
    * 100 TB where both tables are fact-sized. */
  def lateShipmentPriorities(orders: DataFrame, lineitem: DataFrame,
                             lagDays: Int = 60): DataFrame =
    orders.as("o")
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")).as("l"),
        col("o.o_orderkey") === col("l.l_orderkey") &&
          col("l.l_shipdate") > col("o.o_orderdate") + expr(s"INTERVAL $lagDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("late_orders"))

  /** Local-supplier revenue by nation (TPC-H Q5 shape): the full
    * snowflake traversal — region→nation prune two fact-sized
    * dimensions (customer, supplier), two fact-to-fact joins chain
    * through orders and lineitem, and the "local" predicate
    * (customer and supplier in the SAME nation) rides the last join
    * as a residual because it references columns from both chains.
    * This is the one shape the relational set lacked: a MULTI-WAY
    * join where the planner must sequence broadcasts, shuffles and a
    * residual in one plan.
    *
    * Scale shape: nation⋈region is constant-size (25×5 rows) and
    * explicitly broadcast into the customer and supplier scans, so
    * the region prune happens map-side at any scale. customer,
    * orders, lineitem and supplier are all fact-sized at 100 TB, so
    * NONE of them is force-broadcast — the three big joins stay
    * declarative shuffle joins (AQE may still broadcast a
    * post-filter side that turns out small at a given SF, which is
    * exactly the runtime re-plan we want). The year filter is pushed
    * into the orders scan, the region filters reach the customer and
    * supplier scans through the broadcast joins, and revenue
    * accumulates exactly as decimal(30,4) — the same cross-engine
    * determinism as [[pricingSummary]]. */
  def regionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                    regionName: String = "ASIA",
                    dateLo: String = "1996-01-01", dateHi: String = "1997-01-01"): DataFrame = {
    val nations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = supplier
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    orders
      .filter(col("o_orderdate") >= lit(dateLo) && col("o_orderdate") < lit(dateHi))
      .select(col("o_orderkey"), col("o_custkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount")),
        col("o_orderkey") === col("l_orderkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,4)")).cast("double").as("revenue"))
  }

  /** Monthly promo-revenue share (TPC-H Q14 shape, as a trend): what
    * fraction of each month's revenue came from promotional parts —
    * the last relational join shape missing from the set, and the
    * only query touching the `part` table: a fact-to-part join keyed
    * on partkey where BOTH sides scale with the corpus (part is ~30×
    * smaller than lineitem but grows with SF — NOT broadcastable at
    * 100 TB, so the join stays declarative; AQE may broadcast at a
    * tiny SF, a cluster run plans the co-keyed shuffle join, and a
    * deployment that cares buckets both tables on partkey via
    * [[graft.sources.Sinks.writeBucketed]] for a zero-Exchange plan).
    *
    * Both revenue sums accumulate exactly as decimal(30,4) (the
    * conditional arm sums a literal 0 decimal, never a null — SUM
    * skipping nulls would be fine, but an all-null month yielding
    * NULL vs 0 across engines is exactly the kind of boundary this
    * repo pins shut); the share divides the two exact doubles. The
    * month key is a bounded domain, so the aggregate is map-side
    * combinable and the result always fits the driver. */
  def promoRevenueByMonth(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .select(col("l_partkey"), col("l_shipdate"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,4)").as("rev"))
      .join(part.select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev"))
          .otherwise(lit(0).cast("decimal(30,4)"))).cast("double").as("promo_revenue"),
        sum(col("rev")).cast("double").as("total_revenue"))
      .withColumn("promo_share", col("promo_revenue") / col("total_revenue"))

  /** National market share (TPC-H Q8 shape): within one region's
    * customers, one part type and a two-year window, the share of
    * revenue supplied by a target nation, per order year. Adds the
    * SHARE-WITHIN-GROUP shape over the six-table snowflake — the one
    * TPC-H query left expressible over the available tables (Q2, Q9,
    * Q11, Q16 and Q20 need `partsupp`, which the dataset doesn't
    * ship; Q12 needs ship-mode/commit-date columns).
    *
    * Scale shape: the order-date window is pushed into the orders
    * scan and the type filter into the part scan; constant dims
    * (nation, region) broadcast; the customer/part/supplier joins
    * stay declarative so AQE sizes them at runtime (a region's
    * customers are a fifth of the table — not broadcastable at
    * 100 TB, the Q3 rule); numerator and denominator ride ONE
    * conditional aggregate pass (the [[promoRevenueByMonth]] move) —
    * no second scan, no per-nation self-join. Revenue accumulates
    * exactly as decimal(30,4); the share is one double division on
    * the bounded per-year output. */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
                  orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                  part: DataFrame, regionName: String = "ASIA",
                  targetNation: String = "NATION_12", partType: String = "PROMO",
                  dateLo: String = "1996-01-01", dateHi: String = "1998-01-01"): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val supp = supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    orders
      .filter(col("o_orderdate") >= lit(dateLo) && col("o_orderdate") < lit(dateHi))
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
      .join(customer.join(broadcast(regionNations),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(30,4)").as("rev")),
        col("o_orderkey") === col("l_orderkey"))
      .join(part.filter(col("p_type") === partType).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === targetNation, col("rev"))
          .otherwise(lit(0).cast("decimal(30,4)"))).cast("double").as("nation_revenue"),
        sum(col("rev")).cast("double").as("total_revenue"))
      .withColumn("mkt_share", col("nation_revenue") / col("total_revenue"))
  }

  /** Large-quantity orders (TPC-H Q18 shape): orders whose lineitems
    * sum past a quantity threshold, reported with the customer who
    * placed them — the AGGREGATE-THEN-JOIN-BACK shape the rest of the
    * relational set doesn't exercise: the fact table is aggregated
    * FIRST and the HAVING survivors feed back into a join against the
    * fact's parent. (Q3/Q4/Q5 all join raw facts and aggregate last;
    * here the aggregate IS the filter.)
    *
    * Scale shape: the lineitem aggregate is one orderkey-keyed
    * shuffle with map-side combine (sum is combinable), and the
    * HAVING output is a tiny, threshold-controlled fraction of orders
    * — so the join back into `orders` is declarative and AQE
    * broadcasts the survivor side at runtime when it measures small
    * (NOT forced: the qualifying set grows with the corpus, and at
    * 100 TB a low threshold could make it fact-sized). The customer
    * join stays declarative for the same reason, and the final top-N
    * rides TakeOrderedAndProject with the orderkey tiebreak. Quantity
    * accumulates exactly as decimal(30,2) — integer-valued doubles
    * sum exactly, but the decimal form keeps the guarantee when
    * quantities gain real decimals ([[graft.functions.Exact]]). */
  def bigQuantityOrders(orders: DataFrame, lineitem: DataFrame,
                        customer: DataFrame, minQty: Int = 250,
                        n: Int = 100): DataFrame = {
    val big = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(30,2)")).as("qty"))
      .filter(col("qty") > minQty)
    orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("qty").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(n)
  }

  /** Revenue-change forecast (TPC-H Q6 shape): the PURE-PUSHDOWN
    * query — every predicate (date range, discount band, quantity
    * cap) references only scan columns, so the whole WHERE clause
    * reaches the parquet reader as PushedFilters and the plan is one
    * 4-column pruned scan feeding a single map-side-combinable
    * global aggregate. No joins, no wide shuffle, one row out: at
    * 100 TB this query's cost is exactly the I/O the row-group
    * statistics can't skip, which is the point — it is the
    * calibration query for scan efficiency. Revenue accumulates
    * exactly as decimal(30,4) ([[graft.functions.Exact]]). */
  def forecastRevenue(lineitem: DataFrame,
                      dateLo: String = "1996-01-01", dateHi: String = "1997-01-01",
                      discLo: Double = 0.05, discHi: Double = 0.07,
                      maxQty: Int = 24): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(dateLo) && col("l_shipdate") < lit(dateHi) &&
        col("l_discount") >= discLo && col("l_discount") <= discHi &&
        col("l_quantity") < maxQty)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(30,4)"))
        .cast("double").as("revenue"))

  /** Bilateral shipping volume (TPC-H Q7 shape): revenue flowing
    * between two specific nations, by direction and ship year. The
    * shape this adds to the set: TWO independent broadcast prunes of
    * fact-sized dimensions (supplier by nation A∪B, customer by
    * nation A∪B) feeding a fact-to-fact chain, with the
    * "opposite nations" predicate a residual on the final join
    * (it references both pruned chains, so no single-side pushdown
    * exists). nation is constant-size and broadcast; supplier,
    * customer, orders, lineitem all scale with the corpus and stay
    * declarative — at a small SF, AQE broadcasts the post-filter
    * supplier side at runtime; at 100 TB it plans the co-keyed
    * shuffle. The year comes off the ship date (bounded group
    * domain) and revenue accumulates exactly as decimal(30,4). */
  def volumeShipping(supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
                     customer: DataFrame, nation: DataFrame,
                     nationA: String = "NATION_1", nationB: String = "NATION_2",
                     dateLo: String = "1996-01-01", dateHi: String = "1998-01-01"): DataFrame = {
    val nations = nation.filter(col("n_name") === nationA || col("n_name") === nationB)
      .select(col("n_nationkey"), col("n_name"))
    val supp = supplier
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= lit(dateLo) && col("l_shipdate") < lit(dateHi))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,4)").as("rev"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
  }

  /** Returned-item losses (TPC-H Q10 shape): the customers behind the
    * most returned revenue in one quarter. Adds the SELECTIVE-FACT
    * top-k shape: both fact scans carry their own filter (order date
    * window on orders, `l_returnflag = 'R'` on lineitem — both reach
    * PushedFilters), the surviving slices join on the order key, roll
    * up per customer, and only then touch the customer dim — so the
    * dim join processes |qualifying customers| rows, not |orders|.
    * nation is constant-size and broadcast; the final top-N rides
    * TakeOrderedAndProject with a key tiebreak. Revenue accumulates
    * exactly as decimal(30,4). */
  def returnedItemsTop(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       nation: DataFrame, dateLo: String = "1996-01-01",
                       dateHi: String = "1996-04-01", n: Int = 20): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(dateLo) && col("o_orderdate") < lit(dateHi))
      .select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(30,4)").as("rev")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(n)

  /** Top supplier(s) by period revenue (TPC-H Q15 shape): the
    * AGGREGATE-VS-ITS-OWN-MAX query. The per-supplier rollup is one
    * suppkey-keyed shuffle off a date-pruned scan; its maximum then
    * has to confront every rollup row. The 100 TB move is the 1-ROW
    * BROADCAST: aggregate the max into a single row and broadcast-
    * cross it into the rollup (same pattern as the repo's stats
    * cursors and k-means centroids) — NOT a global window
    * (`max().over()` with no partition drags every rollup row
    * through one task) and NOT a self-join on the max value.
    * Revenue accumulates exactly as decimal(30,4), so the equality
    * against the max is exact-on-exact — no float-boundary flakes;
    * ties all surface deterministically. */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
                  dateLo: String = "1996-01-01", dateHi: String = "1996-04-01"): DataFrame = {
    val rev = lineitem
      // the explicit suppkey null-filter matters for SCAN-ONCE: the
      // supplier equi-join injects isnotnull(l_suppkey) into the
      // rollup branch only, making the two aggregate subtrees (rollup
      // and its max) canonically different — with it stated on the
      // shared base, both branches sit on IDENTICAL shuffle subtrees
      // and exchange reuse fingerprints the fact table once
      // (spec-pinned under the at-scale no-broadcast shape)
      .filter(col("l_shipdate") >= lit(dateLo) && col("l_shipdate") < lit(dateHi) &&
        col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,4)")).as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Small-quantity-order revenue (TPC-H Q17 shape): average yearly
    * revenue lost if orders below 20% of a part's average quantity
    * were no longer taken, for one brand. The shape: a CORRELATED
    * per-key average — each lineitem compares against the mean of its
    * OWN part — expressed as a window over the brand-restricted join
    * (the brand filter lands first, so the partkey-partitioned window
    * sees ~1/|brands| of the fact, not all of it; a per-key window
    * IS a keyed shuffle, the safe kind). The threshold comparison is
    * EXACT cross-multiplication: `qty < 0.2 * avg(qty)` rewritten as
    * `5 * qty * count < sum` over integer-valued quantities summed as
    * longs — no float division anywhere near the boundary, so Spark
    * and any oracle agree row-for-row. Revenue accumulates exactly
    * as decimal(30,4); the /7.0 yearly scaling is one division. */
  def smallQtyYearlyRevenue(lineitem: DataFrame, part: DataFrame,
                            brand: String = "Brand#12"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_partkey"))
    lineitem
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
      .join(part.filter(col("p_brand") === brand).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("part_qty_sum", sum(col("qty")).over(w))
      .withColumn("part_cnt", count(lit(1)).over(w))
      .filter(col("qty") * 5 * col("part_cnt") < col("part_qty_sum"))
      .agg((sum(col("l_extendedprice").cast("decimal(30,4)")).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  /** Discounted-revenue audit (TPC-H Q19 shape): revenue from three
    * disjoint brand/size/quantity bands — the OR-OF-ANDS predicate.
    * What the shape exercises: the disjunction references both sides
    * (brand+size from part, quantity from lineitem), so no branch
    * pushes down whole; instead the per-side IMPLIED prefilters
    * (`p_size BETWEEN 1 AND 15`, `l_quantity BETWEEN 1 AND 30`, the
    * brand IN-list) are stated explicitly so they reach both scans as
    * PushedFilters, and the full disjunction evaluates as the join
    * residual on the survivors — the classic "derive the weaker
    * single-table predicate" rewrite done by hand because no planner
    * derives it from an OR. Both sides scale with the corpus; the
    * join stays declarative on partkey. Revenue exact as
    * decimal(30,4), one row out. */
  def discountedRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,4)").as("rev"))
    val pt = part
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
        col("p_size") >= 1 && col("p_size") <= 15)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    li.join(pt, col("l_partkey") === col("p_partkey") && (
      (col("p_brand") === "Brand#12" && col("p_size") <= 5 &&
        col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
        (col("p_brand") === "Brand#23" && col("p_size") <= 10 &&
          col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#34" && col("p_size") <= 15 &&
          col("l_quantity") >= 20 && col("l_quantity") <= 30)))
      .agg(sum(col("rev")).cast("double").as("revenue"))
  }

  /** Idle high-balance customers (TPC-H Q22 shape, keyed on market
    * segment since this schema carries no phone country code):
    * customers whose balance beats the positive-balance average but
    * who never ordered. Two canonical shapes in one plan: a SCALAR
    * subquery (the global average travels as a 1-row broadcast cross
    * join, like [[topSupplier]]'s max) and a fact-sized LEFT ANTI
    * join against orders (the semi-join's missing sibling in this
    * set — output bounded by customers, probe short-circuits). The
    * above-average test is EXACT cross-multiplication:
    * `bal > sum/cnt` rewritten `bal*cnt > sum` over decimal(30,4) —
    * the float-division boundary never exists, so no customer
    * flickers in or out between engines. The final per-segment
    * rollup is bounded-domain, map-side combinable. */
  def idleCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val pos = customer.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast("decimal(30,4)")).as("bal_sum"),
        count(lit(1)).as("bal_cnt"))
    customer
      .crossJoin(broadcast(pos))
      .filter(col("c_acctbal").cast("decimal(12,2)") * col("bal_cnt") > col("bal_sum"))
      .join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sumFixed(col("c_acctbal")).as("totacctbal"))
  }

  /** Order-priority distribution with a status filter — the
    * "statistics by status" pattern (`staging_pg.py:331-344`). */
  def orderPriorityStats(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderstatus") =!= "F")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("order_count"),
        avgFixed(col("o_totalprice")).as("avg_price"))

  /** Suppliers who kept orders waiting (TPC-H Q21 shape): late lines
    * of finished multi-supplier orders where NO other supplier on the
    * same order was also late — the canonical semi-AND-anti pair
    * correlated against the same fact self-join, the one join shape
    * the relational set still lacked. Lateness is `l_shipdate >
    * o_orderdate + lagDays` (this schema's lateness rule, shared with
    * [[lateShipmentPriorities]]).
    *
    * The textbook plan scans lineitem THREE times (l1, the EXISTS
    * side, the NOT-EXISTS side) and at best reuses one self-join
    * exchange. This implementation REWRITES the correlated pair into
    * one per-order lateness profile: scan lineitem⋈orders ONCE,
    * aggregate per (order, supplier) then per order — "some other
    * supplier exists" = distinct-supplier count ≥ 2, "no other
    * supplier late" = exactly one supplier with late lines, and the
    * sole late supplier's late-line count is the Q21 COUNT(*)
    * contribution. Zero lineitem self-joins, zero extra exchanges —
    * strictly better than a reused one at 100 TB, and the DuckDB
    * oracle runs the LITERAL correlated EXISTS/NOT-EXISTS form, so
    * the hash match proves the rewrite every gate run. PlanSpec pins
    * the single lineitem scan.
    *
    * Scale shape: the only corpus-scale shuffles are the orderkey
    * join and the (order, supplier) aggregate (map-side combinable;
    * same key, so one exchange feeds both); supplier⋈nation is a
    * constant-size broadcast applied AFTER the sole-late decision
    * (the anti side must see suppliers of every nation). */
  def waitingOrders(supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
                    nation: DataFrame, nationName: String = "NATION_9",
                    lagDays: Int = 60, topN: Int = 10): DataFrame = {
    val perSupp = lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(count(when(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lagDays DAYS"),
        lit(1))).as("late_lines"))
    val soleLate = perSupp
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        count(when(col("late_lines") > 0, lit(1))).as("n_late_supp"),
        max(when(col("late_lines") > 0,
          struct(col("l_suppkey"), col("late_lines")))).as("sole"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select(col("sole.l_suppkey").as("l_suppkey"), col("sole.late_lines").as("late_lines"))
    val dim = supplier.join(nation,
      col("s_nationkey") === col("n_nationkey") && col("n_name") === nationName)
      .select(col("s_suppkey"), col("s_name"))
    soleLate
      .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(topN)
  }
}
