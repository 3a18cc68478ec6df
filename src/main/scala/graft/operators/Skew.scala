package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew hardening for hot keys (SURVEY §4).
  *
  * AQE's skew-join split handles most runtime skew, but two shapes
  * still die at 100 TB without plan-level help:
  *  - a `groupBy` whose hottest key holds a double-digit percent of
  *    all rows (one reducer does the whole job), and
  *  - a shuffle join where one side's hot keys overwhelm a partition
  *    and the other side is small enough to replicate per salt.
  * Both fixes are pure plan rewrites — no RDDs, no sampling passes.
  * The salt is the input partition id, which is stable for
  * deterministic file splits (unlike `rand()`, which breaks retries
  * and speculative execution) and by construction splits a hot key
  * across however many input partitions carry it.
  */
object Skew {

  /** Salt in [0, buckets): input-partition-derived, retry-stable. */
  def salt(buckets: Int): Column =
    pmod(spark_partition_id(), lit(buckets)).cast("int")

  /** Two-phase salted aggregation: partial-aggregate on (key, salt) —
    * splitting a hot key across up to `buckets` reducers — then merge
    * the per-salt partials. For purely algebraic aggregates Spark's
    * map-side partials usually suffice; this is for when the reduce
    * side itself is the bottleneck (e.g. a distinct-heavy payload
    * keeps partial rows numerous). */
  def saltedCount(df: DataFrame, key: Column, buckets: Int = 16): DataFrame =
    df
      .groupBy(key.as("key"), salt(buckets).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("key"))
      .agg(sum(col("__partial")).as("cnt"))

  /** Salted skew join: salt every row of `big`, replicate every row of
    * `small` once per salt, join on (key, salt). The hot partition
    * becomes up to `buckets` even slices at the cost of a `buckets`×
    * duplication of the SMALL side only. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                 buckets: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", salt(buckets))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<int>")))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Key-skew diagnostics — the measurement that decides whether the
    * salted rewrites above (or AQE skew-join splitting) are needed AT
    * ALL: total rows, distinct keys, the heaviest key's share, and the
    * top-k keys' combined share. A perfectly uniform key has
    * `max_share ≈ 1/keys`; a max_share orders of magnitude above that
    * is the hot-partition smoking gun.
    *
    * Scale shape: one map-side-combinable key count, then every
    * further step runs on the KEY rollup (top-k via TakeOrdered, the
    * totals via a second combinable agg, joined as two 1-row
    * broadcasts). Shares are exact integer ratios — one double
    * division each, cross-engine deterministic. */
  def skewReport(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    require(topK >= 1)
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("c"))
    val totals = counts.agg(
      sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
      max(col("c")).as("max_key_rows"))
    val top = counts.orderBy(col("c").desc, col("key")).limit(topK)
      .agg(sum(col("c")).as("topk_rows"))
    totals.crossJoin(broadcast(top))
      .select(
        col("n_rows"), col("n_keys"), col("max_key_rows"),
        (col("max_key_rows").cast("double") / col("n_rows").cast("double")).as("max_share"),
        col("topk_rows"),
        (col("topk_rows").cast("double") / col("n_rows").cast("double")).as("topk_share"))
  }
}
