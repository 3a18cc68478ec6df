package graft

import java.nio.file.Files

import graft.operators.{Cleaning, Enrichment, Ner}
import org.apache.spark.sql.functions._

/** End-to-end batch pipeline (the reference's Airflow DAG as one
  * call): every layer lands on disk, layer counts agree with the
  * in-memory operators, and the partition layout prunes. */
class PipelineSpec extends SparkSpec {

  test("runBatch writes all layers with operator-consistent counts") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft_pipeline").toString
    val summary = Pipeline.runBatch(spark, dir, out)

    val raw = Tables.documents(spark, dir)
    val bronzeExpected = Cleaning.dedupKeepFirst(raw, md5(col("text")), col("doc_id")).count()
    assert(summary("bronze") === bronzeExpected)
    assert(summary("silver") === bronzeExpected) // silver is a projection, row-preserving
    val goldExpected = Enrichment.gold(
      Cleaning.silver(spark.read.parquet(s"$out/bronze"))).count()
    assert(summary("gold") === goldExpected)
    assert(summary("gold") <= summary("silver")) // quality gate only removes
    assert(summary("entities") > 0)
    assert(summary("gold_analytics") > 0 && summary("gold_trends") > 0)

    // lang partitioning must prune at planning time on the written layout
    val pruned = spark.read.parquet(s"$out/gold").filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
  }
}
