package graft

import graft.operators.{Analytics, Cleaning, Enrichment, Ner}
import graft.sources.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch orchestration of the full medallion pipeline — what the
  * reference runs as an Airflow DAG (`bronze_to_silver` →
  * `silver_to_gold` → NER → view refresh,
  * `/root/reference/airflow_home/dags/`), expressed as one call over
  * composed DataFrames.
  *
  * Each stage is the SAME operator the query registry exposes — the
  * pipeline adds only ordering and sinks. Spark sees the whole lineage
  * and still prunes/pushes per stage because every write re-derives
  * from the narrowest projection it needs. Layout choices are the
  * 100 TB ones: silver/gold land partitioned by `lang` (low
  * cardinality, the dominant read filter) with bounded file sizes;
  * entities and the small rollup views land unpartitioned.
  */
object Pipeline {

  /** Stage outputs: layer name → row count written. */
  type Summary = Map[String, Long]

  def runBatch(spark: SparkSession, sourceDir: String, outDir: String): Summary = {
    val raw = Tables.documents(spark, sourceDir)

    // bronze: append-only raw + exact keep-first dedup on content hash
    val bronze = Cleaning.dedupKeepFirst(raw, md5(col("text")), col("doc_id"))
    Sinks.writeParquet(bronze, s"$outDir/bronze", Seq("lang"))

    // silver: cleaned projection over the deduped bronze
    val silver = Cleaning.silver(spark.read.parquet(s"$outDir/bronze"))
    Sinks.writeParquet(silver, s"$outDir/silver", Seq("lang"))

    // gold: enrichment + quality gate over silver-as-written
    val silverBack = spark.read.parquet(s"$outDir/silver")
    val gold = Enrichment.gold(silverBack)
    Sinks.writeParquet(gold, s"$outDir/gold", Seq("lang"))

    // entities: NER over the deduped bronze corpus
    val entities = Ner.extract(spark, spark.read.parquet(s"$outDir/bronze"))
    Sinks.writeParquet(entities, s"$outDir/entities", Seq.empty)

    // rollup views (the reference's refresh_gold_views step)
    val goldBack = spark.read.parquet(s"$outDir/gold")
    Sinks.writeParquet(Analytics.goldAnalytics(goldBack), s"$outDir/views/gold_analytics", Seq.empty)
    Sinks.writeParquet(Analytics.goldTrends(goldBack), s"$outDir/views/gold_trends", Seq.empty)

    def n(path: String): Long = spark.read.parquet(path).count()
    Map(
      "bronze" -> n(s"$outDir/bronze"),
      "silver" -> n(s"$outDir/silver"),
      "gold" -> n(s"$outDir/gold"),
      "entities" -> n(s"$outDir/entities"),
      "gold_analytics" -> n(s"$outDir/views/gold_analytics"),
      "gold_trends" -> n(s"$outDir/views/gold_trends"))
  }
}
