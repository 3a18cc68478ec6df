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

  test("bronze dedup keeps every null-text doc (content hash is per-doc for nulls)") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_pipe_null").toString
    val out = Files.createTempDirectory("graft_pipe_null_out").toString
    Seq(
      (1L, Option("same text"), "en", "s", 9L),
      (2L, Option("same text"), "en", "s", 9L), // true content dup -> collapses
      (3L, Option.empty[String], "en", "s", 0L), // null text: must BOTH survive
      (4L, Option.empty[String], "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$src/documents.parquet")
    val summary = Pipeline.runBatch(spark, src, out)
    assert(summary("bronze") === 3L) // docs 1, 3, 4
    val kept = spark.read.parquet(s"$out/bronze").select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L))
  }
}
