package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gold-layer enrichment, the silver→gold projection of the reference
  * (`/root/reference/airflow_home/dags/sql/process_silver_to_gold.sql:12-75`).
  *
  * Pure `Column` expressions — `when` chains, calendar extraction,
  * `size(split(...))` — so the projection fuses into the scan under
  * whole-stage codegen and never materializes an intermediate row.
  */
object Enrichment {

  /** Short/Medium/Long/Very Long bucketing (`process_silver_to_gold.sql:22-27`). */
  def contentCategory(len: Column): Column =
    when(len < 500, "Short")
      .when(len < 1500, "Medium")
      .when(len < 3000, "Long")
      .otherwise("Very Long")

  /** Keyword topic mapping (`process_silver_to_gold.sql:44-55`). */
  def topicCategory(topic: Column): Column = {
    val t = lower(topic)
    when(t.like("%politik%") || t.like("%pemerintah%"), "Politik")
      .when(t.like("%ekonom%") || t.like("%bisnis%"), "Ekonomi")
      .when(t.like("%olahraga%") || t.like("%sport%"), "Olahraga")
      .when(t.like("%teknolog%") || t.like("%digital%"), "Teknologi")
      .when(t.like("%kesehatan%") || t.like("%medis%"), "Kesehatan")
      .when(t.like("%pendidikan%") || t.like("%sekolah%"), "Pendidikan")
      .when(t.like("%hukum%") || t.like("%kriminal%"), "Hukum")
      .when(t.like("%internasional%") || t.like("%dunia%"), "Internasional")
      .otherwise(coalesce(topic, lit("Umum")))
  }

  /** Words = space-split segments (`ARRAY_LENGTH(STRING_TO_ARRAY(content,' '),1)`,
    * `process_silver_to_gold.sql:58`). */
  def wordCount(content: Column): Column = size(split(content, " ")).cast("long")

  /** Sentences = dot-split segments (`process_silver_to_gold.sql:59`). */
  def sentenceCount(content: Column): Column = size(split(content, "\\.")).cast("long")

  /** Time-part extraction on an event/publish timestamp
    * (`process_silver_to_gold.sql:30-36`). DOW matches Postgres
    * `EXTRACT(DOW)` = 0-Sunday, hence the `-1`. */
  def timeParts(ts: Column): Seq[Column] = Seq(
    hour(ts).as("publish_hour"),
    (dayofweek(ts) - 1).as("publish_day_of_week"),
    weekofyear(ts).as("publish_week"),
    month(ts).as("publish_month"),
    year(ts).as("publish_year"),
    to_date(ts).as("publish_date"))

  /** Quality flags (`process_silver_to_gold.sql:39-41`). */
  def qualityFlags(title: Column, contentLength: Column, image: Column): Seq[Column] = Seq(
    (title.isNotNull && length(title) > 10).as("has_good_title"),
    (contentLength > 200).as("has_substantial_content"),
    (image.isNotNull && image =!= "").as("has_image"))

  /** Full gold projection over silver documents (no image/date columns
    * in the corpus → has_image/time-parts joined in by callers that
    * have them). Applies the reference's gold quality gate
    * (content_length > 50, non-null content). */
  def gold(silver: DataFrame): DataFrame =
    silver
      .filter(col("content").isNotNull && col("content_length") > 50)
      .withColumn("content_category", contentCategory(col("content_length")))
      .withColumn("topic_category", topicCategory(col("topic")))
      .withColumn("word_count", wordCount(col("content")))
      .withColumn("sentence_count", sentenceCount(col("content")))
      .withColumn("has_substantial_content", col("content_length") > 200)
      .withColumn("search_text",
        concat_ws(" ", col("content"), coalesce(col("topic"), lit(""))))
}
