package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regressions: the scale properties §4 promises, pinned
  * against the AQE-final physical plans on real (sf0.001) data. A
  * change that silently reintroduces a shuffle, loses a pushed
  * filter, or flips a broadcast fails here, not on the cluster. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    df.collect() // materialize so AQE reaches its final plan
    // default maxMetadataStringLength=100 truncates PushedFilters
    // mid-token — widen it so filter assertions see the full list
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  /** The pre-AQE physical plan. For pins on STATIC properties
    * (pushdown, join strategy choice, window keying): at sf0.001 a
    * selective filter can leave zero rows and AQE then collapses
    * whole subtrees to EmptyRelation — the scans (and their
    * PushedFilters) vanish from the final plan even though the
    * at-scale plan has them. */
  private def initialPlan(df: DataFrame): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    df.queryExecution.sparkPlan.toString
  }

  private def count(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  test("accept preview: verdict flag joins all broadcast; id confirm distinct-free on split, semi below distinct on legacy") {
    // r17 VERDICT #3: two plan pins on the decision chain. (1) the
    // per-doc verdict attribution joins ~10 delta-sized id frames
    // onto the input ids — every one a broadcast, never a sort-merge
    // (the frames are micro-batch-sized by construction). (2) the id
    // gate's confirm path scans the postings doc_id column with the
    // broadcast semi-join pushed UNDER the distinct, so the
    // aggregate runs on the delta-matched sliver, never on the
    // corpus-wide id set.
    import spark.implicits._
    val post = "graft_plan_prev_post"; val hash = "graft_plan_prev_hash"
    graft.Pipeline.bootstrapIncremental(
      Seq((1L, (1 to 40).map(i => s"pv$i").mkString(" "))).toDF("doc_id", "text"),
      post, hash)
    val delta = Seq(
      (10L, (1 to 40).map(i => s"pw$i").mkString(" "), "en", "s", 200L),
      (1L, (1 to 40).map(i => s"px$i").mkString(" "), "en", "s", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val verdicts = graft.Pipeline.decideDelta(spark, delta, post, hash).verdicts
    // static plan: all ten flag joins are broadcast
    val staticPlan = initialPlan(verdicts)
    assert(count(staticPlan, "SortMergeJoin") === 0, staticPlan)
    assert(count(staticPlan, "BroadcastHashJoin") >= 9, staticPlan)
    // AQE-final: still no sort-merge anywhere
    assert(count(finalPlan(verdicts), "SortMergeJoin") === 0)
    // (2) the confirm path (forced-scan override), on a colliding id.
    // Split layout (r19): the confirm reads the one-row-per-doc sig
    // table — NO distinct aggregate anywhere, just the broadcast
    // semi-join on the bucketed scan.
    import org.apache.spark.sql.catalyst.plans.logical
    val confirm = graft.Pipeline.corpusIdCollisions(spark,
      Seq(1L).toDF("doc_id"), post, probeOverride = Some(None))
    val opt = confirm.queryExecution.optimizedPlan
    assert(opt.collect { case a: logical.Aggregate => a }.isEmpty,
      s"the sig-table confirm needs no distinct aggregate:\n$opt")
    assert(opt.collect { case j: logical.Join => j }.nonEmpty, s"$opt")
    // Legacy single-table layout (sig table hidden): the distinct
    // returns, with the semi-join pushed UNDER it so the aggregate
    // runs on the delta-matched sliver, never the corpus id set.
    spark.sql(s"ALTER TABLE ${post}__sigs RENAME TO ${post}__sigs__off")
    try {
      val legacy = graft.Pipeline.corpusIdCollisions(spark,
        Seq(1L).toDF("doc_id"), post, probeOverride = Some(None))
      val optL = legacy.queryExecution.optimizedPlan
      val agg = optL.collectFirst { case a: logical.Aggregate => a }
      assert(agg.exists(_.collect { case j: logical.Join => j }.nonEmpty),
        s"the semi-join must be pushed below the distinct:\n$optL")
    } finally
      spark.sql(s"ALTER TABLE ${post}__sigs__off RENAME TO ${post}__sigs")
  }

  test("silver cleaning: single scan, zero shuffles, one native clean pass") {
    val plan = finalPlan(graft.operators.Cleaning.silver(Tables.documents(spark, dir)))
    assert(count(plan, "Exchange") === 0)
    assert(count(plan, "Scan parquet") === 1)
    assert(count(plan, "graft_clean_content") === 1) // evaluated once, not per consumer
  }

  test("keyword_search pushes the text predicate into the parquet scan") {
    val plan = finalPlan(SparkEntry.queries("keyword_search")(spark, dir))
    assert(plan.contains("PushedFilters: [IsNotNull(text), StringContains(text,window)]"))
  }

  test("search_filtered pushes lang, n_chars and text predicates to the scan") {
    val plan = finalPlan(SparkEntry.queries("search_filtered")(spark, dir))
    // PushedFilters renders truncated in toString; check stable prefixes
    assert(plan.contains("EqualTo(lang,en)"))
    assert(plan.contains("IsNotNull(n_chars)"))
  }

  test("q_join_dims: dims broadcast, fact side never broadcast") {
    val plan = finalPlan(SparkEntry.queries("q_join_dims")(spark, dir))
    assert(count(plan, "BroadcastHashJoin") >= 2) // nation, region (+AQE may add customer at tiny sf)
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_topn_revenue: top-N taken before the dim join") {
    val plan = finalPlan(SparkEntry.queries("q_topn_revenue")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(count(plan, "BroadcastHashJoin") >= 1) // the N-row side is the broadcast
  }

  test("ner_extract: the gazetteer join is a broadcast, corpus never shuffles pre-join") {
    val plan = finalPlan(SparkEntry.queries("ner_extract")(spark, dir))
    assert(count(plan, "BroadcastHashJoin") >= 1)
    assert(!plan.contains("SortMergeJoin"))
  }

  test("dedup_canonical: clusters broadcast into the scan; the only shuffle is member-sized") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")
    val plan = finalPlan(graft.operators.Dedup.canonicalPerCluster(
      Tables.documents(spark, dir), clusters))
    assert(count(plan, "Scan parquet") === 1)
    assert(count(plan, "BroadcastHashJoin") === 1) // corpus side stays in place
    assert(!plan.contains("SortMergeJoin"))
    // exactly one data shuffle: the cluster_id groupBy over members
    assert(count(plan, "Exchange hashpartitioning") === 1)
  }

  test("near-dup self-joins fingerprint the corpus ONCE at scale (SMJ → ReusedExchange)") {
    // The signature stage is map-only, so the scan-once property rests
    // on the sort-merge join's two identical band-key exchanges being
    // deduplicated. Disable broadcast to force the at-scale join shape
    // (on tiny data AQE broadcasts one side and legitimately re-runs
    // the cheap scan instead of shuffling).
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      for (q <- Seq("dedup_minhash", "dedup_simhash")) {
        val plan = finalPlan(SparkEntry.queries(q)(spark, dir))
        assert(count(plan, "Scan parquet") === 1, s"$q should scan documents once:\n$plan")
        assert(count(plan, "ReusedExchange") >= 1, s"$q should reuse the banded exchange:\n$plan")
      }
    } finally spark.conf.set(key, saved)
  }

  test("publishing_patterns: one events scan; the global window sees only the rollup") {
    val plan = finalPlan(SparkEntry.queries("publishing_patterns")(spark, dir))
    assert(count(plan, "Scan parquet") === 1, s"should scan events once:\n$plan")
    // the unpartitioned window must consume the aggregate, not the scan
    val windowIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(windowIdx >= 0 && aggIdx >= 0 && windowIdx < aggIdx,
      s"window should sit above the hourly aggregate:\n$plan")
  }

  test("entity_top: rank<=1 window gets a map-side partial WindowGroupLimit") {
    // the window partitions by entity_type (4 values at ANY corpus
    // size) — without the partial group-limit, every aggregated entity
    // row of a type would funnel through one task before ranking
    val plan = finalPlan(SparkEntry.queries("entity_top")(spark, dir))
    assert(plan.contains("WindowGroupLimit") &&
      plan.contains("Partial"), s"expected partial group-limit pushdown:\n$plan")
  }

  test("ann_ivf cell assignment is map-side: no shuffle, no window on the corpus expansion") {
    import org.apache.spark.sql.functions.col
    val ops = graft.operators.Ann
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", ops.norm(col("emb")))
    val plan = finalPlan(ops.nearestCells(e, ops.ivfCentroids(e, 64), "emb", "nrm", keep = 1))
    assert(count(plan, "Window") === 0, s"assignment must not rank per-pair rows:\n$plan")
    // the only exchanges belong to the one-row centroid aggregate and
    // its broadcast — the corpus side reaches the join straight from
    // the scan, so no hash-partitioned shuffle may exist anywhere
    assert(count(plan, "Exchange hashpartitioning") === 0,
      s"corpus side must not shuffle for assignment:\n$plan")
    assert(count(plan, "BroadcastExchange") === 1, s"centroids broadcast once:\n$plan")
  }

  test("keyset pagination: 1-row cursor broadcast; page bounded by TakeOrderedAndProject") {
    val plan = finalPlan(SparkEntry.queries("ranked_search_page2")(spark, dir))
    // the cursor is the ONLY broadcast (1 row); the probe side must be
    // a bare scan — OFFSET-style re-sort of prior pages would show as
    // an extra global Sort or a hash-partitioned exchange
    assert(count(plan, "BroadcastNestedLoopJoin") === 1, s"cursor rides a BNLJ:\n$plan")
    assert(count(plan, "Exchange hashpartitioning") === 0,
      s"page must not shuffle the corpus:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"page sort must be N-bounded:\n$plan")
  }

  test("search_highlight_multi: zero-shuffle map with the contains filter pushed") {
    val plan = finalPlan(SparkEntry.queries("search_highlight_multi")(spark, dir))
    assert(count(plan, "Exchange") === 0, s"highlighting must be map-only:\n$plan")
    assert(plan.contains("StringContains(text,window)"), s"pre-filter must push:\n$plan")
  }

  test("ranked_search_multi: the df stats ride a 1-row broadcast, the corpus never shuffles") {
    val plan = finalPlan(SparkEntry.queries("ranked_search_multi")(spark, dir))
    assert(count(plan, "BroadcastNestedLoopJoin") === 1, s"stats ride a BNLJ:\n$plan")
    assert(count(plan, "Exchange hashpartitioning") === 0,
      s"scoring must not shuffle the corpus:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-N bounds the sort:\n$plan")
  }

  test("overview_metrics: one scan (not the reference's 8 subquery scans)") {
    val plan = finalPlan(SparkEntry.queries("overview_metrics")(spark, dir))
    assert(count(plan, "Scan parquet") === 1)
  }

  test("stratified_sample: a single map-side filter, no shuffle, no sample operator") {
    val plan = finalPlan(SparkEntry.queries("stratified_sample")(spark, dir))
    assert(count(plan, "Exchange") === 0, s"sampling must be map-only:\n$plan")
    assert(count(plan, "Scan parquet") === 1)
  }

  test("group_topk: rank limit pushed below the exchange (WindowGroupLimit)") {
    val plan = finalPlan(SparkEntry.queries("group_topk")(spark, dir))
    // map-side partial top-k per group BEFORE the shuffle — the shape
    // that keeps the exchange at O(groups x k) rows at 100 TB
    assert(count(plan, "WindowGroupLimit") >= 2,
      s"expected partial+final WindowGroupLimit:\n$plan")
  }

  test("length_percentiles: window runs over the distinct-value rollup, single scan") {
    val plan = finalPlan(SparkEntry.queries("length_percentiles")(spark, dir))
    assert(count(plan, "Scan parquet") === 1, s"one corpus scan:\n$plan")
    assert(count(plan, "SortMergeJoin") === 0, s"no join at all:\n$plan")
    // the global-order window must sit ABOVE the per-value aggregate
    // (bounded rollup), never over raw corpus rows
    assert(plan.indexOf("Window") > plan.indexOf("HashAggregate"),
      s"window must consume the aggregated value table:\n$plan")
  }

  test("char_budget_sample: source totals broadcast back onto the scan, no corpus SMJ") {
    val plan = finalPlan(SparkEntry.queries("char_budget_sample")(spark, dir))
    assert(count(plan, "SortMergeJoin") === 0, s"no corpus-sized join:\n$plan")
    assert(count(plan, "BroadcastHashJoin") === 1,
      s"thresholds must ride a broadcast:\n$plan")
  }

  test("retention_cohorts: joinless — one user aggregate + the matrix rollup, no third exchange") {
    val plan = finalPlan(SparkEntry.queries("retention_cohorts")(spark, dir))
    assert(count(plan, "Exchange hashpartitioning") <= 2,
      s"cohorts must come from one user-keyed aggregate:\n$plan")
    assert(count(plan, "Join") === 0, s"no cohort join:\n$plan")
    assert(count(plan, "Scan parquet") === 1, s"events scanned once:\n$plan")
  }

  test("dup_rate_by_source: fp-keyed join co-partitions with the fingerprint aggregate") {
    val plan = finalPlan(SparkEntry.queries("dup_rate_by_source")(spark, dir))
    // fp agg + fp join + source rollup: nothing else corpus-wide
    assert(count(plan, "Exchange hashpartitioning") <= 3,
      s"fp join must reuse fp partitioning:\n$plan")
  }

  test("asofJoin: ONE key exchange, no join operator, no row expansion") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    val plan = finalPlan(graft.operators.Temporal.asofJoin(
      purchases, clicks, "user_id", "ts", "click_ts"))
    // the union+window form: both sides shuffle once on the key and the
    // window walks the merge — the naive range-join+argmax would show a
    // Join node and a per-pair expansion here
    assert(count(plan, "Exchange hashpartitioning") === 1,
      s"as-of must shuffle once on the key:\n$plan")
    assert(count(plan, "Join") === 0, s"no join operator, the window IS the match:\n$plan")
    assert(count(plan, "Window ") >= 1)
  }

  test("funnel_steps: window and per-user aggregate share one user exchange") {
    val plan = finalPlan(SparkEntry.queries("funnel_steps")(spark, dir))
    assert(count(plan, "Exchange hashpartitioning") === 1,
      s"the user aggregate must reuse the window's partitioning:\n$plan")
    assert(count(plan, "Scan parquet") === 1)
  }

  test("rolling_daily: the global window consumes the daily rollup, not raw events") {
    val plan = finalPlan(SparkEntry.queries("rolling_daily")(spark, dir))
    assert(count(plan, "Scan parquet") === 1)
    assert(plan.indexOf("Window") > 0 &&
      plan.indexOf("Window") < plan.indexOf("HashAggregate"),
      s"window must sit above the daily aggregate:\n$plan")
  }

  test("event_pivot: declared pivot domain plans as one scan, no discovery job") {
    val plan = finalPlan(SparkEntry.queries("event_pivot")(spark, dir))
    assert(count(plan, "Scan parquet") === 1, s"no distinct-values pre-pass:\n$plan")
    // Spark plans pivot as two aggregates: (date, type) counts, then
    // pivot_first by date — the second exchange moves the bounded
    // (days x types) rollup, not events. Undeclared values would add a
    // third job (a corpus-wide distinct) before any of this.
    assert(count(plan, "Exchange hashpartitioning") === 2)
  }

  test("rollup_counts: all three grouping levels ride ONE Expand, one scan") {
    val plan = finalPlan(SparkEntry.queries("rollup_counts")(spark, dir))
    assert(count(plan, "Expand") === 1, s"rollup must expand once:\n$plan")
    assert(count(plan, "Scan parquet") === 1)
  }

  test("scrub_boilerplate: grams ride a 1-row broadcast; the scrub is a pure map") {
    val plan = finalPlan(SparkEntry.queries("scrub_boilerplate")(spark, dir))
    assert(count(plan, "BroadcastNestedLoopJoin") === 1,
      s"the gram array must ride a constant broadcast:\n$plan")
    assert(count(plan, "SortMergeJoin") === 0, s"no corpus-keyed join:\n$plan")
    // the only hash exchange belongs to the bigram word-count; the
    // corpus branch goes scan -> BNLJ -> project untouched
    assert(count(plan, "Exchange hashpartitioning") === 1,
      s"only the gram aggregate may shuffle:\n$plan")
  }

  test("topic_terms: top-k rides WindowGroupLimit; n_sources rides a 1-row broadcast") {
    val plan = finalPlan(SparkEntry.queries("topic_terms")(spark, dir))
    assert(count(plan, "WindowGroupLimit") >= 2,
      s"expected partial+final group-limit:\n$plan")
    assert(count(plan, "BroadcastNestedLoopJoin") === 1,
      s"n_sources must ride a 1-row broadcast:\n$plan")
  }

  test("entity_pair_lift: gazetteer-sized sides broadcast; the corpus never sort-merge-joins") {
    val plan = finalPlan(SparkEntry.queries("entity_pair_lift")(spark, dir))
    assert(count(plan, "SortMergeJoin") === 0, s"no corpus-sized join:\n$plan")
    assert(count(plan, "BroadcastHashJoin") >= 3,
      s"dictionary + singles joins must broadcast:\n$plan")
    assert(count(plan, "BroadcastNestedLoopJoin") === 1,
      s"N must ride a 1-row broadcast:\n$plan")
  }

  test("interval_join: equi-key join with the time bounds as a residual, never a cross product") {
    val plan = finalPlan(SparkEntry.queries("interval_join")(spark, dir))
    // the time window must NOT degrade the join to a nested loop /
    // cartesian — it rides the equi-key join as a residual condition
    assert(count(plan, "CartesianProduct") === 0, s"no cross product:\n$plan")
    assert(count(plan, "BroadcastNestedLoopJoin") === 0, s"no nested loop:\n$plan")
    assert(count(plan, "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin") >= 1,
      s"expected a keyed join:\n$plan")
  }

  test("z_value: pure projection — no exchange, no join, single scan") {
    val plan = finalPlan(SparkEntry.queries("z_value")(spark, dir))
    assert(count(plan, "Exchange") === 0, s"the Morton key is map-side:\n$plan")
    assert(count(plan, "Join") === 0)
    assert(count(plan, "Scan parquet") === 1)
  }

  test("gopher_rules: shuffle-free single-scan projection") {
    val plan = finalPlan(SparkEntry.queries("gopher_rules")(spark, dir))
    assert(count(plan, "Exchange") === 0, s"rules run at scan speed:\n$plan")
    assert(count(plan, "Scan parquet") === 1)
  }

  test("dedup_substring: one scan, chunks map-side, exactly two exchanges") {
    // The CDC pair chain's scale contract after the native one-pass
    // chunker: complete chunks are built INSIDE the scan projection
    // (no token explode, no per-doc window, no corpus-token shuffle),
    // so the only exchanges are (a) the chunk-hash postings aggregate
    // and (b) the final pair aggregate.
    val plan = finalPlan(SparkEntry.queries("dedup_substring")(spark, dir))
    assert(count(plan, "Scan parquet") === 1, s"corpus must be scanned once:\n$plan")
    assert(count(plan, "Exchange hashpartitioning") === 2,
      s"expected exactly 2 exchanges (postings, pairs):\n$plan")
    assert(count(plan, "Window") === 0, s"chunking must be map-side, not a window:\n$plan")
    assert(plan.contains("graft_cdc_chunks"), s"native chunker must be in the plan:\n$plan")
    assert(count(plan, "SortMergeJoin|BroadcastHashJoin") === 0,
      s"pairs come from the bounded posting lists, not a join:\n$plan")
  }

  test("q_late_shipments: fact-to-fact LEFT SEMI, neither side broadcast") {
    val plan = finalPlan(SparkEntry.queries("q_late_shipments")(spark, dir))
    assert(plan.contains("LeftSemi"), s"must plan as a semi join:\n$plan")
    // both sides are fact tables: a broadcast of either is the shape
    // that melts at 100 TB (AQE may small-table-broadcast at sf0.001,
    // so pin on the logical join type, not the physical strategy —
    // what must NEVER appear is a cartesian/nested-loop fallback)
    assert(count(plan, "CartesianProduct") === 0)
    assert(count(plan, "Scan parquet") === 2)
  }

  test("analyzed ranked search keeps the raw path's zero-shuffle scoring shape") {
    val plan = finalPlan(SparkEntry.queries("ranked_search_analyzed")(spark, dir))
    // lower() must fuse into the same scan-side projection the raw
    // scorer uses: no exchange beyond the bounded top-N, no join
    assert(count(plan, "Exchange hashpartitioning") === 0, s"scoring is map-side:\n$plan")
    assert(count(plan, "TakeOrderedAndProject") === 1, s"top-N stays bounded:\n$plan")
    assert(count(plan, "Scan parquet") === 1)
  }

  test("q_region_revenue: year filter pushed into the orders scan, constant dims broadcast") {
    val plan = finalPlan(SparkEntry.queries("q_region_revenue")(spark, dir))
    // the year window must reach the orders scan as PushedFilters —
    // at 100 TB this is the partition-prune that makes Q5 feasible
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), s"date not pushed:\n$plan")
    assert(plan.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed:\n$plan")
    // nation⋈region ride explicit broadcasts; the three fact joins
    // stay declarative (AQE may broadcast a post-filter side at tiny
    // sf — only a cartesian fallback is pinned-impossible)
    assert(count(plan, "BroadcastHashJoin") >= 2, s"dims must broadcast:\n$plan")
    assert(count(plan, "CartesianProduct") === 0)
  }

  test("q_market_share: date + type filters pushed, dims broadcast, one aggregate pass") {
    val plan = finalPlan(SparkEntry.queries("q_market_share")(spark, dir))
    // the two-year window prunes orders; the type filter prunes part
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), s"date not pushed:\n$plan")
    assert(plan.contains("EqualTo(p_type,PROMO)"), s"type filter not pushed:\n$plan")
    // constant dims (region -> nation prune, supplier nation) broadcast
    assert(count(plan, "BroadcastHashJoin") >= 2, s"dims must broadcast:\n$plan")
    assert(count(plan, "CartesianProduct") === 0)
    // numerator + denominator in ONE conditional aggregate — a second
    // lineitem scan would double the dominant cost at 100 TB. The 8
    // scans are the 7 tables + nation twice (both dim chains read it;
    // it is constant-size); any more means a duplicated fact scan.
    assert(count(plan, "Scan parquet") <= 8, s"extra fact scan:\n$plan")
  }

  test("dedup_semantic: map-side cell assignment, pair join keyed on cell") {
    val plan = finalPlan(SparkEntry.queries("dedup_semantic")(spark, dir))
    // the quantizer is the native one-pass argmin against a 1-row
    // broadcast centroid aggregate — never a per-centroid row blowup
    assert(count(plan, "graft_ivf_argmin") >= 1, s"native argmin missing:\n$plan")
    assert(count(plan, "CartesianProduct") === 0,
      s"within-cell pairing must be an equi-join on cell:\n$plan")
    // centroids travel as ONE aggregated broadcast row per side
    assert(count(plan, "BroadcastNestedLoopJoin") <= 2, s"centroid row fanout:\n$plan")
  }

  test("q_forecast_revenue: EVERY predicate reaches the scan; one scan, one row out") {
    val plan = finalPlan(SparkEntry.queries("q_forecast_revenue")(spark, dir))
    // the whole WHERE is scan-column-only — all five bounds must
    // land in PushedFilters (this query IS the pushdown yardstick)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), s"date lo not pushed:\n$plan")
    assert(plan.contains("LessThan(l_shipdate"), s"date hi not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_discount,0.05)"), s"disc lo not pushed:\n$plan")
    assert(plan.contains("LessThanOrEqual(l_discount,0.07)"), s"disc hi not pushed:\n$plan")
    assert(plan.contains("LessThan(l_quantity,24.0)"), s"qty cap not pushed:\n$plan")
    assert(count(plan, "Scan parquet") === 1)
    // no joins, no keyed shuffle — just the global-agg single exchange
    assert(count(plan, "Exchange hashpartitioning") === 0, s"no keyed shuffle exists:\n$plan")
  }

  test("q_disc_revenue: the OR's implied prefilters reach BOTH scans") {
    val plan = initialPlan(SparkEntry.queries("q_disc_revenue")(spark, dir))
    // lineitem side: the derived quantity envelope
    assert(plan.contains("GreaterThanOrEqual(l_quantity,1.0)"), s"qty lo not pushed:\n$plan")
    assert(plan.contains("LessThanOrEqual(l_quantity,30.0)"), s"qty hi not pushed:\n$plan")
    // part side: the brand IN-list and size envelope
    assert(plan.contains("In(p_brand"), s"brand list not pushed:\n$plan")
    assert(plan.contains("LessThanOrEqual(p_size,15)"), s"size hi not pushed:\n$plan")
    assert(count(plan, "CartesianProduct") === 0)
  }

  test("q_top_supplier: no global window; 1-row max broadcast; fact fingerprinted ONCE") {
    val init = initialPlan(SparkEntry.queries("q_top_supplier")(spark, dir))
    // an unpartitioned max().over() would drag the whole rollup
    // through one task — the plan must carry no Window at all
    assert(!init.contains("Window"), s"global window leaked in:\n$init")
    // Catalyst rewrites crossJoin(1-row max)+filter into a broadcast
    // equi-join on the revenue value — either broadcast form is the
    // pinned property (the max side is one row)
    assert(count(init, "BroadcastNestedLoopJoin") + count(init, "Cross, BuildRight") === 1,
      s"1-row max must broadcast:\n$init")
    assert(init.contains("GreaterThanOrEqual(l_shipdate"), s"period not pushed:\n$init")
    // at-scale shape (no small-table broadcast): the rollup and its
    // max sit on canonically identical shuffle subtrees, so exchange
    // reuse scans the date-pruned fact once, not twice
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val plan = finalPlan(SparkEntry.queries("q_top_supplier")(spark, dir))
      assert(count(plan, "Scan parquet.*lineitem") === 1,
        s"fact must be scanned once via exchange reuse:\n$plan")
    } finally spark.conf.set(key, saved)
  }

  test("q_returned_items: both fact filters pushed; dim join after the rollup; bounded top-N") {
    val plan = finalPlan(SparkEntry.queries("q_returned_items")(spark, dir))
    assert(plan.contains("EqualTo(l_returnflag,R)"), s"returnflag not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), s"date window not pushed:\n$plan")
    assert(count(plan, "TakeOrderedAndProject") === 1, s"top-N must stay bounded:\n$plan")
    assert(count(plan, "CartesianProduct") === 0)
  }

  test("q_small_qty_revenue: the correlated average is a PER-PART window over the brand slice") {
    val plan = finalPlan(SparkEntry.queries("q_small_qty_revenue")(spark, dir))
    // brand filter reaches the part scan, so the window's keyed
    // shuffle sees the brand slice, not the whole fact
    assert(plan.contains("EqualTo(p_brand,Brand#12)"), s"brand not pushed:\n$plan")
    // the window must be partitioned on the part key — an
    // unpartitioned window here would single-task the fact
    assert(plan.contains("windowspecdefinition(l_partkey"), s"window not keyed:\n$plan")
    assert(count(plan, "CartesianProduct") === 0)
  }

  test("q_idle_customers: 1-row average broadcast + anti-join, no semi/inner fallback") {
    val plan = initialPlan(SparkEntry.queries("q_idle_customers")(spark, dir))
    assert(count(plan, "BroadcastNestedLoopJoin") === 1, s"1-row avg broadcast:\n$plan")
    assert(plan.contains("LeftAnti"), s"anti-join lost:\n$plan")
    // the positive-balance prefilter feeds the average's scan
    assert(plan.contains("GreaterThan(c_acctbal,0.0)"), s"positive filter not pushed:\n$plan")
  }

  test("ranked_search_bm25: stats ride ONE broadcast row, corpus never shuffles, bounded top-N") {
    val plan = finalPlan(SparkEntry.queries("ranked_search_bm25")(spark, dir))
    // same shape contract as ranked_search_multi: the corpus-stats
    // aggregate collapses to one broadcast row, scoring is map-side
    assert(count(plan, "Exchange hashpartitioning") === 0,
      s"scoring must not shuffle the corpus:\n$plan")
    assert(count(plan, "TakeOrderedAndProject") === 1, s"top-N stays bounded:\n$plan")
    assert(count(plan, "BroadcastNestedLoopJoin") === 1, s"stats ride one broadcast row:\n$plan")
  }

  test("shuffle_shards: exactly one keyed exchange (by shard), no global sort") {
    val plan = finalPlan(SparkEntry.queries("shuffle_shards")(spark, dir))
    // the whole shuffle is ONE shard-keyed exchange + per-shard sort;
    // a global ROW_NUMBER would show as an extra single-partition
    // exchange with an unpartitioned window
    assert(count(plan, "Exchange hashpartitioning") === 1, s"one keyed exchange:\n$plan")
    assert(count(plan, "Exchange SinglePartition") === 0,
      s"no corpus-wide single-partition funnel:\n$plan")
    assert(plan.contains("windowspecdefinition(shard"), s"rank must be per-shard:\n$plan")
  }

  test("q_volume_shipping: nation broadcast into both dim prunes, no cartesian") {
    val plan = initialPlan(SparkEntry.queries("q_volume_shipping")(spark, dir))
    assert(count(plan, "BroadcastHashJoin") >= 2, s"nation prunes must broadcast:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), s"ship window not pushed:\n$plan")
    assert(count(plan, "CartesianProduct") === 0)
  }

  test("q_waiting_orders: lineitem scanned ONCE (no Q21 self-join), status pushed, dim broadcast") {
    val plan = initialPlan(SparkEntry.queries("q_waiting_orders")(spark, dir))
    // the whole point of the rewrite: the textbook plan reads lineitem
    // three times (l1 + EXISTS + NOT EXISTS); the profile rewrite reads
    // it exactly once and self-joins nothing
    assert(count(plan, "Scan parquet [^\n]*lineitem") === 1,
      s"lineitem must be scanned exactly once:\n$plan")
    assert(plan.contains("EqualTo(o_orderstatus,F)"), s"status filter not pushed:\n$plan")
    assert(count(plan, "BroadcastHashJoin") >= 1, s"supplier⋈nation dim must broadcast:\n$plan")
    assert(count(plan, "CartesianProduct") === 0)
  }
}
