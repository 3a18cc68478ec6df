package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes `plans/<dir>/<query>_<suffix>.txt` — the AQE-final
  * `explain("formatted")` of named registry queries, the before/after
  * evidence an optimization round commits next to its code. Test-side
  * like [[DailyJobProfiler]]: an instrument, not product surface.
  *
  * Run with:
  *   sbt 'Test/runMain graft.PlanSnap r20 before dedup_clusters,ann_pq'
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(s"plans/$dir"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // drive AQE to the final plan
      val txt = "0x[0-9A-F]{64,}".r.replaceAllIn(
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode),
        m => s"0x<${(m.matched.length - 2) / 2} bytes elided>")
      Files.writeString(Paths.get(s"plans/$dir/${name}_$suffix.txt"), txt)
      println(s"wrote plans/$dir/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
