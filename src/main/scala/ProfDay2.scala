package graft
// scratch profiler — delete before commit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

object ProfDay2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/profday2_wh")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("profday2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap[Long, (Long, String)]()
    val jobs = scala.collection.mutable.ArrayBuffer[(Long, Double, String)]()
    var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case st: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            starts(st.executionId) = (System.nanoTime, st.description.linesIterator.next())
          case en: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            starts.remove(en.executionId).foreach { case (t0, cs) =>
              if (capture) jobs.synchronized {
                jobs += ((en.executionId, (System.nanoTime - t0) / 1e9, cs)) }
            }
          case _ =>
        }
    })
    val sfDir = "/root/testdata/sf0.1"
    val post = "graft_bench_inc_post"; val hash = "graft_bench_inc_hash"
    val chunk = "graft_bench_inc_chunk"; val sem = "graft_bench_inc_sem"
    Pipeline.dropIncrementalState(spark, post, hash,
      chunkTable = Some(chunk), semanticTable = Some(sem))
    val docs = Tables.documents(spark, sfDir)
      .withColumn("__h", substring(md5(col("doc_id").cast("string")), 1, 2))
    val embs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val corpusDocs = docs.filter(col("__h") >= "0c").drop("__h")
    Pipeline.bootstrapIncremental(
      corpusDocs.select(col("doc_id"), col("text")), post, hash,
      chunkTable = Some(chunk), semanticTable = Some(sem),
      corpusEmbeddings =
        Some(embs.join(corpusDocs.select("doc_id"), Seq("doc_id"), "left_semi")),
      bloomShards = 16)
    val base = java.nio.file.Files.createTempDirectory("profday2")
    val days = Seq(("00", "04"), ("04", "08"), ("08", "0c")).zipWithIndex.map {
      case ((lo, hi), i) =>
        val dayDocs = docs.filter(col("__h") >= lo && col("__h") < hi).drop("__h")
        val dir = base.resolve(s"day$i").toString
        dayDocs.write.parquet(s"$dir/documents.parquet")
        (dir, embs.join(dayDocs.select("doc_id"), Seq("doc_id"), "left_semi"), i)
    }
    days.foreach { case (dir, dayEmbs, i) =>
      if (i == 1) capture = true
      val t0 = System.nanoTime
      val sm = Pipeline.runIncremental(spark, dir, base.resolve(s"out$i").toString,
        post, hash, chunkTable = Some(chunk), semanticTable = Some(sem),
        deltaEmbeddings = Some(dayEmbs))
      println(f"PROF day$i ${(System.nanoTime - t0) / 1e9}%8.2f s  " +
        sm.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
      if (i == 1) {
        capture = false
        jobs.sortBy(-_._2).take(25).foreach { case (id, d, cs) =>
          println(f"PROFJOB $d%7.2f s  job$id%-8s $cs")
        }
        println(f"PROFJOB total ${jobs.map(_._2).sum}%7.2f over ${jobs.size} jobs")
      }
    }
    spark.stop()
  }
}
