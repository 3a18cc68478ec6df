package graft.streaming

import java.sql.Timestamp

import graft.operators.Cleaning
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2 #38-40), mirroring the
  * reference's continuous pipeline: the raw→clean Kafka transformer
  * (`/root/reference/processor/stream_cleaner.py:1-187`), the
  * micro-batch windowed loader (`/root/reference/pipeline/
  * consumer_pipeline.py`), and consumer session batching.
  *
  * Each operator is the SAME declarative transform whether the input
  * is bounded or unbounded — `cleanStream` literally reuses the batch
  * silver projection. Batch twins of the windowed operators are
  * registered as oracle-checked queries; the unbounded forms are
  * exercised with MemoryStream in the test suite.
  */
object Streams {

  /** Continuous raw→clean: the silver projection applied to a
    * (streaming) documents frame. Stateless — no watermark needed,
    * arbitrarily scalable. */
  def cleanStream(rawDocuments: DataFrame): DataFrame =
    Cleaning.silver(rawDocuments)

  /** Watermarked tumbling-window counts over the event stream — the
    * micro-batch "stats every 30 s" loop of the reference, expressed
    * as a proper event-time window (late data handled by the
    * watermark instead of being silently double-counted). */
  def windowedCounts(events: DataFrame,
                     windowLength: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("events"), col("sum_value"))

  /** Batch twin of [[windowedCounts]] (same grouping semantics, no
    * watermark) — registered with a DuckDB oracle. */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("sum_value"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("events"), col("sum_value"))

  /** Sliding (hopping) windowed counts — the overlap variant of
    * [[windowedCounts]]: a 1-hour window advancing every 15 minutes
    * places each event in length/slide = 4 overlapping windows — the
    * dashboard shape for "the last hour, refreshed every few minutes",
    * with smooth trend edges instead of tumbling-boundary jumps.
    * Per-key state grows by the overlap factor and stays
    * watermark-bounded; windows are epoch-aligned on the slide, the
    * same anchor DuckDB's `time_bucket` uses, so the batch twin
    * oracle-checks. */
  def slidingCounts(events: DataFrame,
                    windowLength: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength, slide), col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("events"), col("sum_value"))

  /** Batch twin of [[slidingCounts]] — registered with a DuckDB oracle
    * (each event expands to its length/slide overlapping windows). */
  def slidingCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("sum_value"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("events"), col("sum_value"))

  /** Streaming exact dedup — the unbounded twin of the reference's
    * `ON CONFLICT (link) DO NOTHING` bronze upsert
    * (`staging_pg.py:139-189`): keep the first occurrence of each key,
    * drop replays. `dropDuplicatesWithinWatermark` bounds the dedup
    * state to one watermark interval — the non-negotiable at 100 TB,
    * where an unbounded seen-keys set would grow with the stream
    * forever. Duplicates farther apart than the watermark fall to the
    * batch-side `Cleaning.dedupKeepFirst` compaction pass (same
    * key, same keep-first semantics). */
  def dedupStream(raw: DataFrame, key: String = "id",
                  eventTimeCol: String = "ts",
                  watermark: String = "10 minutes"): DataFrame =
    raw
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(key)

  /** Micro-batch bronze ingest — the reference's consumer loop
    * (`pipeline/consumer_pipeline.py`) lands each poll as a PG upsert;
    * the file-native equivalent is append-only bronze plus exact dedup
    * at read (`Cleaning.dedupKeepFirst`), because a 100 TB object
    * store has no per-row upsert — compaction dedups, readers dedup,
    * writers only ever append. */
  def microBatchIngest(raw: DataFrame, path: String,
                       checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(path)
        ()
      }
      .start()

  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, events: Int)
  case class UserSession(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                         events: Int, duration_sec: Double)

  /** Gap-based sessionization with `flatMapGroupsWithState`: events of
    * a user belong to one session while consecutive gaps stay under
    * `gapMinutes`; a session closes when the event-time watermark
    * passes its end + gap (timeout), so state is bounded by the number
    * of OPEN sessions, never by history — the property that keeps
    * state stores small on an unbounded 100 TB/day stream. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def close(userId: Long, s: SessionState): UserSession =
      UserSession(userId, new Timestamp(s.start), new Timestamp(s.end), s.events,
        (s.end - s.start) / 1000.0)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val closed = close(userId, state.get)
            state.remove()
            Iterator.single(closed)
          } else {
            val times = batch.map(_.ts.getTime).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[UserSession]
            times.foreach { t =>
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  // a late-but-within-watermark event can precede the
                  // session start — extend both ends, not just the end
                  open = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), events = s.events + 1))
                case Some(s) =>
                  closed += close(userId, s)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
        })
  }

  /** Batch twin of [[sessionize]] as pure window functions: a session
    * break is a gap > `gapMinutes`, the session id is the running sum
    * of breaks — two window passes over the same (user_id, ts)
    * partitioning, so only ONE shuffle. Registered with a DuckDB
    * oracle. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    // Compare gaps in integer MICROSECONDS: unix_timestamp truncates to
    // whole seconds, so a 1800.6 s gap would read as 1800 and not break
    // the session while a fractional-second oracle breaks it.
    val gapMicros = gapMinutes * 60L * 1000000L
    val micros = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_break",
        when(col("prev_ts").isNull ||
          micros(col("ts")) - micros(col("prev_ts")) > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_break")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("events"))
      .select(col("user_id"), col("session_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("events"))
  }

  /** Watermarked stream-stream interval join — the unbounded twin of
    * [[graft.operators.Temporal.intervalJoin]] (whose registry query
    * `interval_join` is the oracle-checked batch contract): every
    * purchase joined to the same user's clicks from the preceding
    * `windowMinutes`. Both sides carry watermarks AND the join
    * condition bounds event-time distance, which is exactly what
    * Structured Streaming needs to evict join state: a click older
    * than (watermark - window) can never match again and is dropped,
    * so state is bounded by rate × window regardless of stream age.
    *
    * Contract: `clicks(user_id, click_ts, ...)`,
    * `purchases(p_user_id, p_ts, ...)` — disjoint names because
    * stream-stream joins resolve columns by name across both sides. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      windowMinutes: Int = 30): DataFrame =
    clicks.withWatermark("click_ts", s"$windowMinutes minutes")
      .join(
        purchases.withWatermark("p_ts", s"$windowMinutes minutes"),
        expr(s"""user_id = p_user_id AND
                 p_ts > click_ts AND
                 p_ts <= click_ts + INTERVAL $windowMinutes MINUTES"""))
}
