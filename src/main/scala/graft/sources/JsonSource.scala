package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** JSON message source (SURVEY §2 #42) — the analog of the reference's
  * Kafka JSON consumers (`/root/reference/services/kafka_services.py`):
  * messages carry a JSON payload that is parsed against an EXPLICIT
  * schema with `from_json`. Explicit because schema inference reads
  * the data twice and infers per-batch (a drifting schema on an
  * unbounded stream); a declared schema makes the parse a single
  * codegen'd projection, identical in batch and streaming.
  */
object JsonSource {

  /** Schema of the `events.props` payload. */
  val propsSchema: StructType = new StructType().add("k", IntegerType)

  /** Parse the `props` JSON column (batch or streaming — same plan). */
  def parseProps(events: DataFrame): DataFrame =
    events.withColumn("props_k", from_json(col("props"), propsSchema).getField("k"))

  /** Batch JSON-lines reader with declared schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Streaming JSON-lines reader — `readStream` twin of [[readJson]]. */
  def readJsonStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Quarantining JSON reader: good rows parse against the declared
    * schema, malformed lines land in a `_corrupt_record` column
    * (PERMISSIVE mode) and are split out — returns (parsed, rejects).
    * At ingestion scale "one bad producer kills the batch" (FAILFAST)
    * and "bad rows silently become nulls" (plain PERMISSIVE) are both
    * wrong: the pipeline continues AND the rejects stay addressable
    * for replay/alerting — the reference consumer's try/except-per-
    * message loop, made columnar. Spark requires selecting the corrupt
    * column through a cache boundary separately, hence the eager split
    * here rather than handing back one frame with the raw column. */
  def readJsonQuarantine(spark: SparkSession, path: String,
                         schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // localCheckpoint, not cache(): see [[CsvSource.readCsvQuarantine]]
      // — cache() pins blocks in the CacheManager across ingest batches
      // (a leak in long-lived sessions); checkpoint blocks free
      // themselves when the split frames go unreachable
      .localCheckpoint()
    val good = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, bad)
  }
}
