package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps AQE-final formatted physical plans of named registry queries
  * into `plans/r21/<name>_<suffix>.txt` — the before/after plan
  * evidence the optimization rounds commit (same conventions as
  * [[PlanDump]]: sf0.01, collect() to drive AQE to the final plan,
  * giant binary literals elided). Test-side instrument, same license
  * as DailyJobProfiler.
  *
  * Usage: Test/runMain graft.PlanDumpR21 <suffix> <query1,query2,...>
  */
object PlanDumpR21 {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    Files.createDirectories(Paths.get("plans/r21"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // drive AQE to the final plan
      val text = "0x[0-9A-F]{64,}".r.replaceAllIn(
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode),
        m => s"0x<${(m.matched.length - 2) / 2} bytes elided>")
      Files.writeString(Paths.get(s"plans/r21/${name}_$suffix.txt"), text)
      println(s"wrote plans/r21/${name}_$suffix.txt (${text.length} chars)")
    }
    spark.stop()
  }
}
