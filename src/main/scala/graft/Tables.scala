package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the graft engine.
  *
  * The reference (simple-etl) reads its corpus from PostgreSQL tables
  * (`/root/reference/services/staging_pg.py:303`) — here every table is a
  * columnar parquet scan so Catalyst can prune columns and push filters
  * down to the reader, which is what survives a 100 TB corpus.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor. */
  val BroadcastDims: Set[String] = Set("region", "nation", "supplier", "part")

  /** Columns every loader guarantees — verified on load so schema drift
    * fails fast at the scan, not three joins later. */
  val RequiredColumns: Map[String, Seq[String]] = Map(
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"),
    "lineitem" -> Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
      "o_orderpriority"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "region" -> Seq("r_regionkey", "r_name"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    RequiredColumns.get(name).foreach { req =>
      val missing = req.filterNot(df.columns.contains)
      require(missing.isEmpty, s"table $name at $dir is missing columns: ${missing.mkString(",")}")
    }
    df
  }

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.parquet` has shipped `ts` under two physical types across
    * generator versions: parquet TIMESTAMP(NANOS) — which Spark's
    * vectorized reader can only surface as a raw long (nanos since
    * epoch) via the `nanosAsLong` conf — and plain TIMESTAMP(MICROS),
    * which reads as a timestamp directly. Resolve the schema with
    * `nanosAsLong` enabled, then normalize on whatever type came back,
    * so either file layout yields the same `timestamp_ntz` column
    * (naive timestamps, matching the DuckDB oracle's TIMESTAMP).
    *
    * The nanos→micros integer division is lossless here: the generator
    * emits micro-aligned nanos; sub-micro precision, if it ever
    * appeared, would truncate.
    *
    * `nanosAsLong` is a session-wide SQL conf (Spark exposes no
    * per-read option for it), so it is saved and restored around the
    * schema-resolving read — other nanos-timestamp parquet reads in
    * the same session keep their configured behavior. Restoring is
    * safe because the conf only matters at analysis time (schema
    * resolution happens inside `load`), not when the scan executes. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = load(spark, dir, "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        case org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp_ntz"))
        case other =>
          // A drifted ts type (string/date/int32) silently cast would
          // yield nulls three queries later; fail at the scan instead.
          throw new IllegalStateException(
            s"events.ts at $dir has unexpected type $other; " +
              "expected parquet TIMESTAMP(NANOS) (long), TIMESTAMP(MICROS), or timestamp_ntz")
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
}
