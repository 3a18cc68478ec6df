package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}
import org.apache.spark.sql.types._

/** Kafka connector surface — the Spark-native analog of the reference's
  * data bus (`/root/reference/services/kafka_services.py:18-45`: raw/clean
  * topic pair, bootstrap servers from config, latest-offset consumers;
  * `/root/reference/pipeline/consumer_pipeline.py:45-57`: consumer group,
  * bounded poll batches).
  *
  * Spark's Kafka integration is declarative: a `format("kafka")` scan
  * whose partitions map 1:1 to Kafka topic partitions (each executor
  * consumes a disjoint partition range — the parallel-consumer story the
  * reference hand-rolls with `max_poll_records` loops). The reference's
  * producer-side reliability knobs (acks=all, idempotence, retries)
  * belong to the broker client and carry through the `kafka.`-prefixed
  * passthrough options.
  *
  * No broker exists in this sandbox, so what is buildable-and-testable
  * here is exactly what a user configures: the OPTION MAPS (pure
  * functions, unit-tested), the reader/writer builders that apply them,
  * and the wire-schema decode/encode transforms that bridge Kafka's
  * fixed record schema to typed frames. The decode path is spec-proven
  * end-to-end on a MemoryStream carrying the wire schema, composed with
  * the silver clean — the reference's raw-topic → clean-topic flow
  * (`/root/reference/processor/stream_cleaner.py`).
  */
object KafkaSource {

  /** Kafka's fixed scan output schema (public Spark contract): every
    * `format("kafka")` read yields exactly these columns. Specs build
    * frames with this schema; a real cluster gets it from the broker. */
  val wireSchema: StructType = new StructType()
    .add("key", BinaryType)
    .add("value", BinaryType)
    .add("topic", StringType)
    .add("partition", IntegerType)
    .add("offset", LongType)
    .add("timestamp", TimestampType)
    .add("timestampType", IntegerType)

  /** Reader configuration — the consumer surface of
    * `kafka_services.py:36-45` mapped to Spark option names.
    * `startingOffsets` defaults to "latest" like the reference's
    * `auto.offset.reset`; batch reads should pass "earliest".
    * `maxOffsetsPerTrigger` is the micro-batch bound that replaces the
    * reference's `max_poll_records`. `groupIdPrefix` lets operators
    * monitor lag per pipeline without pinning a group id (Spark manages
    * offsets itself via checkpoints, not committed group offsets). */
  final case class ReaderConfig(
      bootstrapServers: String,
      subscribe: Seq[String],
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true,
      groupIdPrefix: Option[String] = None,
      minPartitions: Option[Int] = None) {
    require(bootstrapServers.nonEmpty, "bootstrapServers must be non-empty")
    require(subscribe.nonEmpty && subscribe.forall(_.nonEmpty),
      "subscribe needs at least one non-empty topic")
    require(Set("latest", "earliest").contains(startingOffsets) ||
      startingOffsets.trim.startsWith("{"),
      s"startingOffsets must be latest/earliest or a per-partition JSON map, got: $startingOffsets")
  }

  /** The option map a [[ReaderConfig]] compiles to — pure and
    * unit-testable without a broker. */
  def readerOptions(cfg: ReaderConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.subscribe.mkString(","),
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString) ++
      cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      cfg.groupIdPrefix.map("groupIdPrefix" -> _) ++
      cfg.minPartitions.map("minPartitions" -> _.toString)

  /** Writer option map (`kafka.bootstrap.servers` + default topic).
    * Client-level reliability knobs from the reference's producer
    * config (`kafka_services.py:24-33`) pass through with the `kafka.`
    * prefix, e.g. `Map("kafka.acks" -> "all")`. */
  def writerOptions(bootstrapServers: String, topic: String,
                    clientOverrides: Map[String, String] = Map.empty): Map[String, String] = {
    require(bootstrapServers.nonEmpty && topic.nonEmpty,
      "bootstrapServers and topic must be non-empty")
    val bad = clientOverrides.keys.filterNot(_.startsWith("kafka."))
    require(bad.isEmpty,
      s"client overrides must be kafka.-prefixed passthroughs, got: ${bad.mkString(",")}")
    Map("kafka.bootstrap.servers" -> bootstrapServers, "topic" -> topic) ++ clientOverrides
  }

  /** Streaming reader with the config applied — unstarted (`.load()`
    * needs a broker + the kafka connector jar on the cluster). */
  def streamReader(spark: SparkSession, cfg: ReaderConfig): DataStreamReader =
    spark.readStream.format("kafka").options(readerOptions(cfg))

  /** Batch reader twin — same options; batch defaults should pass
    * `startingOffsets = "earliest"` to read the retained log. */
  def batchReader(spark: SparkSession, cfg: ReaderConfig) =
    spark.read.format("kafka").options(readerOptions(cfg))

  /** Decode a Kafka wire frame into a typed frame: key/value arrive as
    * bytes; the value payload is JSON parsed against a DECLARED schema
    * (same rationale as [[JsonSource]] — inference on an unbounded
    * stream drifts). Keeps the Kafka metadata columns a consumer
    * pipeline needs for lineage (topic/partition/offset = the
    * reference's message bookkeeping, `consumer_pipeline.py:263-302`).
    * One codegen'd projection; identical in batch and streaming. */
  def decodeJson(wire: DataFrame, payloadSchema: StructType): DataFrame =
    wire.select(
      col("key").cast("string").as("key"),
      from_json(col("value").cast("string"), payloadSchema).as("payload"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("kafka_ts"))
      .select(col("key") +: col("topic") +: col("partition") +: col("offset") +:
        col("kafka_ts") +: payloadSchema.fieldNames.toSeq.map(f => col(s"payload.$f")): _*)

  /** Encode a typed frame for a Kafka write: `value` = JSON of the
    * payload columns, `key` = the partitioning key (the reference keys
    * messages by article link so re-deliveries of one article land in
    * one partition — same idea: key by the dedup column). Kafka accepts
    * string or binary key/value; string keeps the spec round-trip
    * readable. */
  def encodeJson(df: DataFrame, keyCol: String, payloadCols: Seq[String]): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(payloadCols.map(col): _*)).as("value"))

  /** Streaming writer to a topic — unstarted (callers `.start()` on a
    * cluster with the connector). Checkpointing gives the exactly-once
    * sink semantics the reference approximates with idempotent
    * producers + manual flush (`kafka_services.py:24-33`). */
  def streamWriter(df: DataFrame, bootstrapServers: String, topic: String,
                   checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("kafka")
      .options(writerOptions(bootstrapServers, topic))
      .option("checkpointLocation", checkpoint)
}
