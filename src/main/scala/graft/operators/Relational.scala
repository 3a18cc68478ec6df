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

  /** Order-priority distribution with a status filter — the
    * "statistics by status" pattern (`staging_pg.py:331-344`). */
  def orderPriorityStats(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderstatus") =!= "F")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("order_count"),
        avgFixed(col("o_totalprice")).as("avg_price"))
}
