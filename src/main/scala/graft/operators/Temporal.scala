package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Event-time operators over the stream table: point-in-time (as-of)
  * joins, funnel conversion, and trailing-window trends — the
  * product-analytics surface the reference's consumer pipeline feeds
  * (`/root/reference/pipeline/consumer_pipeline.py` batches events
  * into PG; these are the queries its dashboards then run on time).
  *
  * Scale notes: the as-of join is the union+window form — ONE shuffle
  * of lefts+rights on the key, never a per-key range cross-product
  * (the naive `l JOIN r ON key AND r.ts <= l.ts` + argmax explodes as
  * |l per key| × |r per key| and dies on hot keys at 100 TB). Funnel
  * metrics reuse the user-hash partitioning between the window and the
  * per-user aggregate (one exchange); the rolling trend windows over
  * the bounded DAILY rollup, not raw events.
  */
object Temporal {

  /** As-of join: each left row is matched to the single most recent
    * right row with the same `key` and `rightTs <= leftTs` (left outer
    * — unmatched lefts keep NULL payload). The right side must be
    * unique per (key, rightTs): pre-aggregate duplicates away, or the
    * pick among same-timestamp rights is tie-broken arbitrarily.
    *
    * Implementation: tag and union both sides, sort each key's
    * partition once by (ts, side — rights first at equal ts, so the
    * match is inclusive), and carry the latest right payload forward
    * with `last(_, ignoreNulls)` over a running frame. This is the
    * merge-join formulation of ASOF JOIN (what DuckDB/kdb do natively)
    * expressed in one Spark window: a single hash exchange on the key,
    * O(n log n) per-partition sort, zero row expansion regardless of
    * how many rights precede a left.
    *
    * Output: every left column, then every right column except `key`
    * (names must not collide — rename before joining). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String): DataFrame = {
    val payload = right.columns.filterNot(_ == key).toSeq
    require(payload.contains(rightTs), s"right side must carry its timestamp column $rightTs")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"right payload collides with left columns: $collisions")

    val leftType = StructType(left.schema.fields)
    val rightType = StructType(right.select(payload.map(col): _*).schema.fields)
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(left.columns.toSeq.map(col): _*).as("__row"),
      lit(null).cast(rightType).as("__asof"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(leftType).as("__row"),
      struct(payload.map(col): _*).as("__asof"))

    val running = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__asof"), ignoreNulls = true).over(running))
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(c => col(s"__row.$c").as(c)) ++
        payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Two-step funnel over the event stream: of all users, how many
    * reached `stepA`, how many then did `stepB` AT OR AFTER their
    * first `stepA`, and the mean time to convert. A `stepB` that
    * precedes the user's first `stepA` is not a conversion — that
    * ordering constraint is what separates a funnel from two counts.
    *
    * Scale shape: first-step timestamps come from an unordered
    * whole-partition window min (no sort — the frame is the entire
    * user partition), and the per-user aggregate that follows reuses
    * the same user-hash partitioning, so the corpus shuffles ONCE; the
    * final funnel row is a driver-sized global aggregate. The
    * conversion-time sum accumulates exact decimal micros
    * ([[graft.functions.Exact]] argument: 64-bit micro sums overflow
    * near 1e9 users × month-long gaps, two orders below 100 TB). */
  def funnelSteps(events: DataFrame, stepA: String = "signup",
                  stepB: String = "purchase"): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val perUser = events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("__first_a",
        min(when(col("event_type") === stepA, col("ts"))).over(byUser))
      .groupBy(col("user_id"))
      .agg(
        min(col("__first_a")).as("first_a"),
        min(when(col("event_type") === stepB && col("ts") >= col("__first_a"),
          col("ts"))).as("first_b"))
    val gapUs = expr("unix_micros(cast(first_b as timestamp)) - unix_micros(cast(first_a as timestamp))")
    perUser.agg(
      count(lit(1)).as("users"),
      sum(when(col("first_a").isNotNull, 1L).otherwise(0L)).as("reached_first"),
      sum(when(col("first_b").isNotNull, 1L).otherwise(0L)).as("converted"),
      (sum(gapUs.cast("decimal(30,0)")).cast("double")
        / sum(when(col("first_b").isNotNull, 1L).otherwise(0L))).as("avg_us_to_convert"))
  }

  /** Trailing `windowDays`-observed-day moving aggregate of daily event
    * volume — the smoothed dashboard trend line. The frame is ROWS
    * over the date-ordered daily rollup (trailing N *observed* days;
    * on a gapless stream that equals N calendar days — the synthetic
    * stream and most production streams are dense at day grain).
    *
    * Scale shape: the global-order window runs over the DAILY rollup
    * (≤365 rows/year at any corpus size), never raw events — the same
    * bounded-rollup argument as publishing_patterns' share-of-total.
    * The average is an exact integer ratio: one double division at the
    * end, no running float accumulation. */
  def rollingDaily(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1)
    val trailing = Window.orderBy(col("date"))
      .rowsBetween(-(windowDays - 1), Window.currentRow)
    events
      .groupBy(to_date(col("ts")).as("date"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("date"), col("cnt"),
        sum(col("cnt")).over(trailing).as("win_events"),
        count(lit(1)).over(trailing).as("win_days"))
      .withColumn("rolling_avg", col("win_events").cast("double") / col("win_days"))
  }

  /** Interval (range) join: every (left, right) pair with the same
    * `key` whose right timestamp falls in `(leftTs, leftTs + window]`
    * — the attribution join ("which purchases followed this click
    * within 30 minutes"), and the batch twin of the watermarked
    * stream-stream join ([[graft.streaming.Streams.attributionJoin]]).
    * Unlike [[asofJoin]] (one best match, no expansion) this KEEPS
    * every in-window pair — use it when downstream wants the pair
    * list, not a point lookup.
    *
    * Scale shape: the join is equi-keyed on `key` — Spark plans the
    * usual hash-partitioned SMJ/SHJ and evaluates the time bounds as
    * a join residual, so there is no time-bucket cross product and no
    * row expansion beyond true matches. (A key-less pure range join
    * would need time-bucketing both sides to an equi key first; with
    * a real key — user, session, device — that machinery is dead
    * weight.) Column names must be disjoint apart from `key`. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   window: String = "INTERVAL 30 MINUTES"): DataFrame = {
    val collisions = right.columns.toSet
      .intersect(left.columns.toSet).filterNot(_ == key)
    require(collisions.isEmpty, s"right columns collide with left: $collisions")
    left.join(right,
      left(key) === right(key) &&
        right(rightTs) > left(leftTs) &&
        right(rightTs) <= left(leftTs) + expr(window))
      .drop(right(key))
  }
}
