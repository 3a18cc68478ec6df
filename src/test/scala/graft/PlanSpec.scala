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
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def count(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  test("silver cleaning: single scan, zero shuffles, one regex chain") {
    val plan = finalPlan(graft.operators.Cleaning.silver(Tables.documents(spark, dir)))
    assert(count(plan, "Exchange") === 0)
    assert(count(plan, "Scan parquet") === 1)
    assert(count(plan, "regexp_replace") === 9) // evaluated once, not per consumer
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

  test("overview_metrics: one scan (not the reference's 8 subquery scans)") {
    val plan = finalPlan(SparkEntry.queries("overview_metrics")(spark, dir))
    assert(count(plan, "Scan parquet") === 1)
  }
}
