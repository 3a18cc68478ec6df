package graft
// scratch — delete before commit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfIns {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", "/tmp/profins_wh")
      .config("spark.ui.enabled", "false").appName("profins").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def rows = (0 until 16).map(i => (i, 16, Array.fill(200000)(7.toByte), 1000L, 0.03, 100L))
      .toDF("shard", "nshards", "bloom", "capacity", "fpp", "items")
    def t(name: String)(f: => Unit): Unit = {
      val s = System.nanoTime; f
      println(f"PROF $name%-22s ${(System.nanoTime - s) / 1e9}%7.2f s")
    }
    spark.sql("DROP TABLE IF EXISTS profins_a"); spark.sql("DROP TABLE IF EXISTS profins_b")
    rows.write.mode("overwrite").format("parquet").saveAsTable("profins_a")
    rows.write.mode("overwrite").format("parquet").saveAsTable("profins_b")
    (1 to 2).foreach { r =>
      t(s"saveAsTable_x5_$r") {
        (1 to 5).foreach(_ => rows.write.mode("overwrite").format("parquet").saveAsTable("profins_a"))
      }
      t(s"insertInto_x5_$r") {
        (1 to 5).foreach(_ => rows.write.mode("overwrite").insertInto("profins_b"))
      }
      t(s"tblprops_x5_$r") {
        (1 to 5).foreach(_ => spark.sql("ALTER TABLE profins_b SET TBLPROPERTIES ('graft.fpp'='0.03')"))
      }
    }
    spark.stop()
  }
}
