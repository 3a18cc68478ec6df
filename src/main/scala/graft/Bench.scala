package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Each query is fully
  * executed through a `noop` write sink — unlike `count()`, a noop
  * write cannot let Catalyst prune the projection under measurement
  * (a count of `silver_clean` would skip the regex chain entirely).
  * Failures are reported per-query in an `errors` map, never as fake
  * timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=a,b,c restricts the run (local iteration on one
    // query); the driver never sets it, so its runs cover everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        // Full GC between queries: Spark's ContextCleaner releases the
        // previous queries' broadcast blocks only when their references
        // are collected, so without this the 40+ accumulated broadcasts
        // squeeze the heap and a query's measurement absorbs its
        // predecessors' GC debt (observed as 10x swings on identical
        // plans mid-suite).
        System.gc()
        // Warm-up execution first (JIT + code cache + file index), then
        // the min of two measured runs: steady-state plan cost, not JVM
        // cold start or a GC pause (round-3 bench swung 1.9x on
        // identical code with a single cold measurement).
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        timings(name) = runs.min
      } catch {
        case e: Throwable => errors(name) = Json.errorSummary(e)
      }
    }
    val qs = timings.map { case (k, v) => s"${Json.str(k)}:$v" }.mkString("{", ",", "}")
    val es = Json.obj(errors)
    val total = timings.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":${Json.str(sfDir)}}""")
    spark.stop()
  }
}
