package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable stage-attribution probe for the ngram-Jaccard pair chain
  * (r20): times each prefix of the chain through the noop sink so the
  * increments attribute cost to (a) the shingle explode, (b) the
  * bounded-collect postings aggregate, (c) sizes, (d) the pair explode
  * + pair aggregate, (e) the size joins + threshold. Test-side
  * instrument, same license as DailyJobProfiler. */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PAIRPROBE $label%-28s ${ts.min}%6.3f s")
    }
    val sh = operators.Dedup.shingleRows(docs)
    time("explode")(sh)
    val postings = sh.groupBy(col("shingle"))
      .agg(call_function("graft_bounded_collect", col("doc_id"), lit(100)).as("ds"))
      .filter(col("ds").isNotNull)
      .select(sort_array(col("ds")).as("ds"))
    time("postings")(postings)
    val sizes = postings.select(explode(col("ds")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    time("postings+sizes")(sizes)
    val common = postings
      .filter(size(col("ds")) >= 2)
      .select(explode(flatten(transform(col("ds"), (a, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          b => struct(a.as("d1"), b.as("d2")))))).as("p"))
      .groupBy(col("p.d1").as("doc_id_1"), col("p.d2").as("doc_id_2"))
      .agg(count(lit(1)).as("common"))
    time("postings+pairs")(common)
    time("full chain")(operators.Dedup.ngramJaccardPairs(docs))
    spark.stop()
  }
}
