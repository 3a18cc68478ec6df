package graft

import graft.operators.Enrichment
import org.apache.spark.sql.functions._

/** Gold enrichment semantics vs
  * `/root/reference/airflow_home/dags/sql/process_silver_to_gold.sql:12-75`. */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  test("contentCategory buckets at 500/1500/3000") {
    val r = Seq(0L, 499L, 500L, 1499L, 1500L, 2999L, 3000L, 10000L).toDF("n")
      .select(Enrichment.contentCategory(col("n"))).collect().map(_.getString(0))
    assert(r.toSeq === Seq("Short", "Short", "Medium", "Medium", "Long", "Long",
      "Very Long", "Very Long"))
  }

  test("topicCategory keyword mapping, fallback to topic, then Umum") {
    val r = Seq("politik nasional", "Bisnis", "OLAHRAGA", "tech-digital", "gaya hidup", null)
      .toDF("t").select(Enrichment.topicCategory(col("t"))).collect().map(_.getString(0))
    assert(r.toSeq === Seq("Politik", "Ekonomi", "Olahraga", "Teknologi", "gaya hidup", "Umum"))
  }

  test("wordCount and sentenceCount are split-based like the reference SQL") {
    val df = Seq("one two three. four five.").toDF("c")
    val w = df.select(Enrichment.wordCount(col("c"))).head().getLong(0)
    val s = df.select(Enrichment.sentenceCount(col("c"))).head().getLong(0)
    assert(w === 5L)
    assert(s === 3L) // dot-split segments, matching ARRAY_LENGTH(STRING_TO_ARRAY(...))
  }

  test("quality flags: good title > 10 chars, substantial > 200, image non-empty") {
    val df = Seq(("a short ttl", 201L, "img.jpg"), ("tiny", 200L, "")).toDF("t", "n", "i")
    val flags = df.select(Enrichment.qualityFlags(col("t"), col("n"), col("i")): _*)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    assert(flags.toSeq === Seq((true, true, true), (false, false, false)))
  }

  test("gold applies the content_length > 50 quality gate") {
    val silver = Seq(
      ("id1", 1L, "x" * 60, 60L, "en", "t"),
      ("id2", 2L, "x" * 10, 10L, "en", "t"))
      .toDF("id", "doc_id", "content", "content_length", "lang", "topic")
    assert(Enrichment.gold(silver).select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }
}
