package graft.operators

import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's analytics views re-expressed as single-pass Spark
  * aggregations.
  *
  * Sources: `/root/reference/init.sql:100-156` (daily/topic/hourly/
  * weekly views), `/root/reference/apx.py:64-160` (dashboard metrics),
  * `/root/reference/services/es.py:242-345` (ES aggregations).
  *
  * Scale notes: every query is one hash-aggregate over a pruned scan —
  * partial (map-side) aggregation bounds shuffle volume by
  * |groups| × partitions, not |rows|. The pct-of-total in
  * `publishingPatterns` windows over the already-aggregated ≤24
  * rollup rows, not the input. `overviewMetrics` collapses the
  * reference's 8 scalar
  * subqueries (8 table scans, `apx.py:66-76`) into ONE
  * conditional-aggregation scan. Averages use [[graft.functions.Exact]]
  * so results are partitioning-independent.
  */
object Analytics {

  /** view_daily_analytics (`init.sql:104-116`) over the events stream. */
  def dailyAnalytics(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("publish_date"))
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("event_type")).as("unique_types"),
        avgFixed(col("value")).as("avg_value"),
        sum(when(col("value") < 50, 1L).otherwise(0L)).as("small_events"),
        sum(when(col("value") >= 50 && col("value") < 150, 1L).otherwise(0L)).as("medium_events"),
        sum(when(col("value") >= 150, 1L).otherwise(0L)).as("large_events"))

  /** view_topic_analytics (`init.sql:119-131`): per-topic rollup. */
  def topicAnalytics(gold: DataFrame): DataFrame =
    gold
      .filter(col("topic").isNotNull)
      .groupBy(col("topic"))
      .agg(
        count(lit(1)).as("total_articles"),
        avgLong(col("content_length")).as("avg_content_length"),
        sum(when(col("content_category") === "Long" || col("content_category") === "Very Long", 1L)
          .otherwise(0L)).as("long_articles"),
        min(col("content_length")).as("min_length"),
        max(col("content_length")).as("max_length"))

  /** view_publishing_patterns (`init.sql:134-143`): hour-of-day counts
    * with share-of-total.
    *
    * The pct-of-total is an unpartitioned window over the POST-
    * AGGREGATION rollup — at most 24 rows at any corpus size, so the
    * single-partition exchange WindowExec warns about moves ≤24 rows,
    * not the input. The alternatives are strictly worse: a separate
    * grand-total aggregate re-scans the events table (Catalyst prunes
    * the total branch to a narrower aggregate, so the rollup exchange
    * cannot be reused — verified in the AQE-final plan), and the
    * window keeps the query one scan + one shuffle (plan-spec-pinned). */
  def publishingPatterns(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events
      .groupBy(hour(col("ts")).cast("long").as("publish_hour"))
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("event_type")).as("unique_types"),
        avgFixed(col("value")).as("avg_value"))
      .withColumn(
        "percentage",
        round(col("total_events") * 100.0 / sum(col("total_events")).over(Window.partitionBy()), 2))
  }

  /** view_weekly_trends (`init.sql:146-156`). */
  def weeklyTrends(events: DataFrame): DataFrame =
    events
      .groupBy(
        year(col("ts")).cast("long").as("publish_year"),
        weekofyear(col("ts")).cast("long").as("publish_week"))
      .agg(
        min(to_date(col("ts"))).as("week_start"),
        max(to_date(col("ts"))).as("week_end"),
        count(lit(1)).as("total_events"),
        countDistinct(col("event_type")).as("unique_types"),
        avgFixed(col("value")).as("avg_value"))

  /** Dashboard overview metrics (`apx.py:64-80`) — the reference runs
    * 8 scalar subqueries (8 scans); one conditional aggregation here. */
  def overviewMetrics(gold: DataFrame): DataFrame =
    gold.agg(
      count(lit(1)).as("total_articles"),
      countDistinct(col("topic")).as("unique_topics"),
      countDistinct(col("lang")).as("unique_langs"),
      avgLong(col("content_length")).as("avg_content_length"),
      sum(when(col("content_length") > 200, 1L).otherwise(0L)).as("substantial_articles"))

  /** Content quality analytics (`apx.py:137-160`). */
  def contentAnalytics(gold: DataFrame): DataFrame =
    gold
      .groupBy(col("content_category"))
      .agg(
        count(lit(1)).as("cnt"),
        avgLong(col("word_count")).as("avg_words"),
        avgLong(col("sentence_count")).as("avg_sentences"),
        sum(when(col("has_substantial_content"), 1L).otherwise(0L)).as("substantial"))

  /** view_gold_analytics (`process_silver_to_gold.sql:78-105`):
    * per-topic_category rollup over the enriched gold layer. */
  def goldAnalytics(gold: DataFrame): DataFrame =
    gold
      .groupBy(col("topic_category"))
      .agg(
        count(lit(1)).as("total_articles"),
        avgLong(col("content_length")).as("avg_content_length"),
        avgLong(col("word_count")).as("avg_word_count"),
        sum(when(col("content_category") === "Long" || col("content_category") === "Very Long", 1L)
          .otherwise(0L)).as("long_articles"),
        sum(when(col("has_substantial_content"), 1L).otherwise(0L)).as("substantial_articles"),
        countDistinct(col("topic")).as("unique_topics"))

  /** view_gold_trends (`process_silver_to_gold.sql:100-118`):
    * per-topic_category trend rollup with deduped sample snippets.
    * The reference's `STRING_AGG(DISTINCT LEFT(title, 50), '; ')` is
    * `concat_ws('; ', sort_array(collect_set(...)))` — sorted so the
    * result is deterministic under any partitioning (Postgres only
    * gets that by accident of its single-node sort). */
  def goldTrends(gold: DataFrame): DataFrame =
    gold
      .groupBy(col("topic_category"))
      .agg(
        count(lit(1)).as("daily_count"),
        avgLong(col("content_length")).as("avg_length"),
        concat_ws("; ", sort_array(collect_set(substring(col("content"), 1, 20))))
          .as("sample_snippets"))

  /** Pipeline layer statistics (`staging_pg.py:323-372`): the bronze /
    * silver progress counters as ONE conditional-aggregation scan
    * instead of the reference's two per-table count queries. */
  def pipelineStats(silver: DataFrame): DataFrame =
    silver.agg(
      count(lit(1)).as("total"),
      sum(when(col("content").isNotNull && length(col("content")) > 0, 1L).otherwise(0L))
        .as("cleaned"),
      sum(when(col("content_length") > 50, 1L).otherwise(0L)).as("gold_eligible"),
      sum(when(col("content_length") > 200, 1L).otherwise(0L)).as("substantial"),
      avgLong(col("content_length")).as("avg_content_length"),
      countDistinct(col("topic")).as("unique_topics"),
      countDistinct(col("lang")).as("unique_langs"))

  /** Per-stage processing rates (`viz.py:189-224`
    * `get_processing_times`): the reference UNION-ALLs three full
    * table scans (bronze/silver/gold); here ONE conditional-
    * aggregation scan over silver feeds a 3-row stage explode —
    * same output shape, a third of the reads. Bronze rows are all
    * ingested (processed = total), silver counts non-empty cleans,
    * gold counts quality-gate survivors. */
  def processingStageStats(silver: DataFrame): DataFrame =
    silver
      .agg(
        count(lit(1)).as("bronze_total"),
        sum(when(col("content").isNotNull && length(col("content")) > 0, 1L).otherwise(0L))
          .as("silver_processed"),
        sum(when(col("content_length") > 50, 1L).otherwise(0L)).as("gold_total"))
      .select(explode(array(
        struct(lit("Bronze").as("stage"), col("bronze_total").as("total_records"),
          col("bronze_total").as("processed")),
        struct(lit("Silver").as("stage"), col("bronze_total").as("total_records"),
          col("silver_processed").as("processed")),
        struct(lit("Gold").as("stage"), col("gold_total").as("total_records"),
          col("gold_total").as("processed")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.total_records").as("total_records"),
        col("s.processed").as("processed"),
        round(col("s.processed") * 100.0 / col("s.total_records"), 2).as("processing_rate"))

  /** Trailing-window daily counts (`viz.py:224-248`
    * `get_daily_articles`: last 30 days, newest first) with the same
    * injected deterministic `now` as [[overviewRecency]]. */
  def recentDaily(events: DataFrame, now: String, days: Int = 30): DataFrame =
    events
      .filter(to_date(col("ts")) >= date_sub(to_date(lit(now)), days))
      .groupBy(to_date(col("ts")).as("date"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("date").desc)

  /** Daily × type trends (`apx.py:97-112`). */
  def timeTrends(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("publish_date"), col("event_type"))
      .agg(
        count(lit(1)).as("daily_count"),
        avgFixed(col("value")).as("avg_value"))

  /** ES terms aggregation (`es.py:242-271`): top topics by count. */
  def topicAgg(documents: DataFrame, topN: Int = 20): DataFrame =
    documents
      .groupBy(col("source").as("topic"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("topic"))
      .limit(topN)

  /** ES date_histogram (`es.py:273-302`), `interval` = day/week/month
    * like the endpoint's `interval: str = "day"` parameter (weeks are
    * ISO Monday-start in both Spark and the oracle). */
  def dateHistogram(events: DataFrame, interval: String = "day"): DataFrame = {
    require(Set("day", "week", "month", "year").contains(interval),
      s"unsupported date_histogram interval: $interval")
    events
      .groupBy(date_trunc(interval, col("ts")).as("bucket"))
      .agg(count(lit(1)).as("doc_count"))
  }

  /** Relative-date overview counts (`apx.py:69-70`: `today_articles`,
    * `week_articles`) over the events stream. The reference anchors on
    * CURRENT_DATE; a deterministic pipeline takes the clock as an
    * INJECTED `now` (ISO date string) so replays and oracles agree.
    * One conditional-aggregation scan; "this week" is the trailing 7
    * days inclusive, as in the reference's `>= CURRENT_DATE - 7 days`. */
  def overviewRecency(events: DataFrame, now: String): DataFrame = {
    val today = to_date(lit(now))
    events.agg(
      count(lit(1)).as("total_events"),
      sum(when(to_date(col("ts")) === today, 1L).otherwise(0L)).as("today_events"),
      sum(when(to_date(col("ts")) >= date_sub(today, 7), 1L).otherwise(0L)).as("week_events"))
  }

  /** Bronze↔silver layer reconciliation (`viz.py:133-160`
    * `get_bronze_silver_diff`): which rows the clean changed, which
    * are missing downstream, and what the gold gate would drop —
    * folded to a per-topic rollup. The reference renders raw diff ROWS
    * (`b.content != s.content OR s.content IS NULL`) into a dashboard
    * table; returning those rows at 100 TB is a driver OOM, and the
    * rollup is what the dashboard plots. One equi-join on the layer
    * key, then one hash aggregate. */
  def layerDiff(bronze: DataFrame, silver: DataFrame): DataFrame =
    bronze.select(col("doc_id"), col("text"), col("n_chars"), col("source").as("topic"))
      .join(silver.select(col("doc_id"), col("content"), col("content_length")),
        Seq("doc_id"), "left")
      .groupBy(col("topic"))
      .agg(
        count(lit(1)).as("bronze_rows"),
        sum(when(col("content").isNull, 1L).otherwise(0L)).as("missing_in_silver"),
        sum(when(col("content").isNotNull && col("content") =!= col("text"), 1L).otherwise(0L))
          .as("changed_rows"),
        sum(when(col("content_length") <= 50, 1L).otherwise(0L)).as("below_gold_gate"),
        sum(col("n_chars") - coalesce(col("content_length"), lit(0L))).as("chars_removed"))

  /** Retention sweep (`/root/reference/services/pg_staging.py:399-427`
    * `cleanup_old_data`): bronze keeps `keepDays`, silver twice as
    * long, and the run reports how much each layer sheds. The
    * reference row-DELETEs in place; a lake never does — expiry is
    * [[expireOlderThan]] (a partition-prunable filter rewritten/
    * dropped at the storage layer) and this sweep is its dry-run
    * report: ONE conditional-aggregation scan, deterministic via the
    * injected `now` (like [[overviewRecency]]). */
  def retentionSweep(events: DataFrame, now: String, keepDays: Int = 30): DataFrame = {
    val today = to_date(lit(now))
    events.agg(
      count(lit(1)).as("total_events"),
      sum(when(to_date(col("ts")) < date_sub(today, keepDays), 1L).otherwise(0L))
        .as("bronze_expired"),
      sum(when(to_date(col("ts")) < date_sub(today, keepDays * 2), 1L).otherwise(0L))
        .as("silver_expired"))
  }

  /** The retention filter itself: rows at or after the cutoff. The
    * predicate is on the RAW timestamp column (no cast), so on a
    * date/ts-partitioned layer it partition-prunes — expiry reads and
    * rewrites nothing but the affected partitions. */
  def expireOlderThan(df: DataFrame, tsCol: Column, cutoffTs: String): DataFrame =
    df.filter(tsCol >= lit(cutoffTs).cast("timestamp_ntz"))

  /** Weekly retention cohorts: users grouped by first-seen week, and
    * for each (cohort, week offset) how many came back — the standard
    * activity-retention matrix over the event stream. Week truncation
    * is Monday-start on both engines; the offset is exact integer
    * day-difference DIV 7, so no doubles and no calendar arithmetic
    * ambiguity.
    *
    * Scale shape: first-seen date AND the distinct activity-week set
    * come out of ONE user-keyed aggregate (`collect_set` dedups
    * in-buffer; state per user is bounded by calendar weeks, not
    * events), so there is no cohort join at all — the naive
    * first-seen-join-activity formulation re-shuffles the (user,
    * week) distinct a second time because it hash-partitions on both
    * columns (measured: 4 exchanges vs 2 here). After the explode
    * every row is a distinct (user, week), and cohort_week is a
    * function of the user, so the matrix count needs no
    * countDistinct. Two exchanges total: the user aggregate and the
    * (weeks × offsets)-sized final rollup. */
  def retentionCohorts(events: DataFrame, maxWeeks: Int = 8): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        min(to_date(col("ts"))).as("first_date"),
        collect_set(date_trunc("week", col("ts")).cast("date")).as("weeks"))
      .select(
        date_trunc("week", col("first_date")).cast("date").as("cohort_week"),
        explode(col("weeks")).as("activity_week"))
      .withColumn("week_offset",
        expr("datediff(activity_week, cohort_week) DIV 7"))
      .filter(col("week_offset") <= maxWeeks)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))

  /** Day × event-type crosstab via the DataFrame pivot API — the
    * wide-format dashboard matrix. The pivot values are DECLARED
    * (`types`), not discovered: `pivot(col)` without values runs an
    * extra distinct job over the corpus and caps at
    * `spark.sql.pivotMaxValues`; with a declared domain the plan is
    * one aggregate, same as the conditional-sum form. Missing cells
    * are 0, not NULL (a day with no errors has zero errors). */
  def eventPivot(events: DataFrame,
                 types: Seq[String] = Seq("click", "error", "purchase", "signup", "view")): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("date"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)

  /** Hierarchical totals in one pass: per-(lang, source) counts, the
    * per-lang subtotal, and the grand total via ROLLUP grouping sets —
    * the reference runs separate queries per level (`apx.py` issues
    * one aggregate per dashboard card). `gid` is the standard grouping
    * bitmask (0 = leaf, 1 = source aggregated, 3 = grand total) so
    * consumers can tell a real NULL group from a rollup row.
    *
    * Scale shape: Spark plans ROLLUP as ONE expanded aggregate (each
    * input row feeds every grouping set) — one scan and one shuffle
    * for all three levels, vs three scans as separate queries. */
  def rollupCounts(documents: DataFrame): DataFrame =
    documents
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("docs"), avgLong(col("n_chars")).as("avg_chars"),
        grouping_id().cast("long").as("gid"))

  /** ES stats aggregation (`es.py:304-345`): min/max/avg/sum/count. */
  def statsAgg(documents: DataFrame): DataFrame =
    documents.agg(
      count(col("n_chars")).as("cnt"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      avgLong(col("n_chars")).as("avg_chars"),
      sum(col("n_chars")).as("sum_chars"))
}
