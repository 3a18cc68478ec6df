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

  /** Continuous quality gate: the Gopher battery enforced at ingest —
    * documents failing any rule never land. Stateless like
    * [[cleanStream]] (one shuffle-free projection+filter), so the
    * SAME transform runs bounded or unbounded; the batch form is the
    * oracle-checked `gopher_filter` registry row and the stream≡batch
    * equivalence is spec-pinned. Dropping at ingest is the 100 TB
    * move: a document that fails a stateless rule costs its scan once
    * here versus every downstream pass if filtered later. */
  def qualityGateStream(rawDocuments: DataFrame): DataFrame =
    graft.operators.TextOps.gopherFilter(rawDocuments)

  /** The WHOLE medallion chain as one continuous query: raw →
    * silver ([[cleanStream]]) → gold (`Enrichment.gold`) — the
    * reference runs this as two separate batch jobs against staging
    * tables (`process_silver_to_gold.sql`); here both layers are
    * stateless projections, so they FUSE into a single unbounded
    * transform (one codegen stage per micro-batch, no intermediate
    * table, no second scan). Batch twins `silver_clean` and
    * `gold_enrich` are both oracle-checked; the stream≡batch
    * equivalence is spec-pinned on the composed chain. */
  def goldStream(rawDocuments: DataFrame): DataFrame =
    graft.operators.Enrichment.gold(cleanStream(rawDocuments))

  /** Continuous NER mentions: the STREAM-STATIC join — the unbounded
    * document stream joins the dimension-sized gazetteer, the one
    * join shape Structured Streaming runs statelessly (the static
    * side broadcasts into every micro-batch; no watermark, no state
    * store, nothing grows). The batch twin's registry row
    * (`ner_extract`) is oracle-checked; only the per-doc aggregate
    * step stays batch-side (an unbounded groupBy would need a
    * watermark column the corpus lacks — mentions ARE the append
    * stream). */
  def nerStream(spark: org.apache.spark.sql.SparkSession,
                rawDocuments: DataFrame, dictionary: DataFrame): DataFrame =
    graft.operators.Ner.mentions(spark, rawDocuments, dictionary)

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

  case class NearDupHit(doc_id: Long, matched_doc_id: Long, band: Int)

  /** Near-duplicate guard AT INGEST — the streaming face of the batch
    * MinHash+LSH path ([[graft.operators.Dedup.minhashPairs]]): the
    * signature is the SAME map-only native expression, band keys are
    * the SAME xxhash64 over signature slices, and "candidate" means
    * the same thing (any band collision). What changes is the join:
    * an unbounded stream cannot self-join its whole history, so each
    * (band, band_hash) bucket carries ONE long of state — the first
    * doc_id that ever landed there — and every later arrival emits a
    * hit against it. That makes the guard keep-first, exactly like
    * [[dedupStream]]: the first copy passes clean, replays and
    * near-rewrites get flagged as they arrive.
    *
    * State is bounded two ways: one long per bucket (never a member
    * list — a viral boilerplate bucket cannot grow it), and
    * event-time timeout expires buckets the watermark has passed, so
    * the store tracks only buckets active inside the horizon — the
    * property that keeps it small on an unbounded 100 TB/day stream.
    * Like the batch LSH path, hits are CANDIDATES: confirm-or-drop
    * (exact Jaccard on the pair) is a downstream batch join over the
    * flagged ids. A doc near-dup of one inside the horizon is caught;
    * one whose twin expired falls through to the periodic batch sweep
    * — the same watermark trade [[dedupStream]] documents. */
  def nearDupStream(rawDocuments: DataFrame, bands: Int = 16, rowsPerBand: Int = 4,
                    watermark: String = "10 minutes"): Dataset[NearDupHit] = {
    import rawDocuments.sparkSession.implicits._
    graft.GraftExtensions.register(rawDocuments.sparkSession)
    val sigs = rawDocuments
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), col("ts"),
        call_function("graft_minhash_sig",
          call_function("graft_shingles", col("text"), lit(3)),
          lit(bands * rowsPerBand)).as("sig"))
    val bandCols = (0 until bands).map { b =>
      xxhash64((lit(b) +: (0 until rowsPerBand).map(r => col("sig")(b * rowsPerBand + r))): _*)
    }
    sigs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        posexplode(array(bandCols: _*)).as(Seq("band", "band_hash")))
      .as[(Long, Timestamp, Int, Long)]
      .groupByKey { case (_, _, band, h) => (band, h) }
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: (Int, Long), rows: Iterator[(Long, Timestamp, Int, Long)],
         state: GroupState[Long]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic within-batch order: earliest (ts, doc_id)
            // becomes the bucket owner if the bucket is fresh
            val docs = rows.map { case (id, t, _, _) => (t.getTime, id) }.toArray.sorted
            val out = Seq.newBuilder[NearDupHit]
            var owner = state.getOption
            docs.foreach { case (_, id) =>
              owner match {
                case Some(first) => if (id != first) out += NearDupHit(id, first, key._1)
                case None => owner = Some(id)
              }
            }
            owner.foreach(state.update)
            // bucket lives until the watermark passes its newest
            // arrival plus one horizon
            state.setTimeoutTimestamp(docs.last._1, watermark)
            out.result().iterator
          }
        })
  }

  case class SemanticHit(doc_id: Long, corpus_doc: Long, cosine: Double)

  /** Continuous SEMANTIC near-dup guard — the streaming twin of the
    * daily-ingest semantic arm
    * ([[graft.operators.Ann.incrementalSemanticMatches]], the probe
    * [[graft.Pipeline.runIncremental]] runs per delta): each arriving
    * vector is assigned to its trained-quantizer cell by the same
    * map-side broadcast argmin every quantizer consumer uses, joined
    * against the PERSISTED cell index on the cell id, and flagged
    * against any corpus member above the cosine threshold. This is
    * the arm that catches a PARAPHRASED re-delivery — zero shingle
    * overlap, so [[nearDupStream]]'s MinHash buckets are structurally
    * blind to it — as it arrives, instead of at the nightly batch.
    *
    * Fully STATELESS (a stream-static equi-join plus projections): no
    * watermark, no state store — the corpus side is the bucketed
    * index table, re-read per micro-batch (cache it for a hot loop),
    * and the centroid set is a constant-size broadcast. Scale shape
    * is identical to the batch probe: the 100 TB corpus index never
    * shuffles (bucketed on `cell`); only the micro-batch moves.
    * Contract, spec-pinned: at `nprobe = 1` the emitted hits are
    * EXACTLY the batch probe's rows for the same delta. Like the
    * batch arm, hits above the threshold are the drop/review signal;
    * docs whose vectors arrive later than the text fall through to
    * the nightly sweep. */
  def semanticProbeStream(rawVectors: DataFrame, cellIndex: DataFrame,
                          centroids: DataFrame,
                          threshold: Double = 0.35): Dataset[SemanticHit] = {
    import rawVectors.sparkSession.implicits._
    // the candidate core is the batch probe's own
    // ([[graft.operators.Ann.semanticProbeRows]]) — one definition,
    // so the spec-pinned stream == batch contract cannot drift; at
    // nprobe = 1 pairs are already unique, so the batch wrapper's
    // max-aggregate is unnecessary (and an unbounded stream could not
    // run it without state anyway)
    graft.operators.Ann
      .semanticProbeRows(rawVectors, cellIndex, centroids, threshold, nprobe = 1)
      .select(col("delta_doc").as("doc_id"), col("corpus_doc"),
        col("cos").as("cosine"))
      .as[SemanticHit]
  }

  case class HeavyHitter(source: String, term: String, est: Long, trigger: Long)

  /** Continuous per-source heavy hitters — the streaming face of the
    * batch Misra-Gries aggregate
    * ([[graft.functions.FreqItemsAgg]] / `heavy_hitters_audit`):
    * per-source state is the SAME k-counter sketch, updated through
    * the SAME shared core ([[graft.functions.MisraGries]]) so stream
    * and batch can never disagree on the semantics. Each trigger
    * folds the micro-batch's tokens into the sketch and emits the
    * current k rows per source — a live "what is flooding this feed"
    * view at ingest (boilerplate bursts, crawler loops, spam
    * campaigns) without waiting for the nightly token rollup.
    *
    * State is k entries per source FOREVER — no watermark, no
    * timeout, no growth: the sketch is bounded by construction on an
    * unbounded stream, which is the whole reason MG (and not an
    * exact rollup) is the thing a 100 TB/day feed can keep per key.
    * The MG guarantees survive batching (update order is arbitrary
    * in the proof): every term above N/(k+1) of the tokens seen so
    * far is in the emitted rows, estimates never overcount, and with
    * ≤ k distinct terms the counts are EXACT running totals — the
    * contracts the spec pins against the batch audit's booleans.
    *
    * LATEST-WINS CONTRACT (r13 ADVICE): Append mode means an
    * append-only sink accumulates every trigger's refreshed totals —
    * superseded rows are never retracted. Each emitted row therefore
    * carries `trigger`, the source's update counter (how many
    * micro-batches have touched that source's sketch, persisted in
    * state, so it survives restarts and never repeats). The current
    * snapshot of a source is its max-trigger row set, deterministic
    * for any consumer; [[graft.sources.Sinks.streamingGroupReplaceSink]]
    * applies exactly that rule to keep a persisted one-row-set-per-
    * source snapshot table live across restarts.
    *
    * STATE-SCHEMA MIGRATION: adding the trigger counter changed the
    * state type from `Map[String, Long]` to `(Map[String, Long],
    * Long)` — a checkpoint written by the pre-trigger build fails
    * Spark's state-schema compatibility check on restart. Restarting
    * an old query on this build means a fresh checkpointLocation
    * (the sketch rebuilds from the stream; MG totals restart from
    * the cutover, which the trigger column makes visible
    * downstream). */
  def heavyHittersStream(rawDocuments: DataFrame, k: Int = 32): Dataset[HeavyHitter] = {
    import rawDocuments.sparkSession.implicits._
    rawDocuments
      .select(col("source"), explode(split(lower(col("text")), " ")).as("term"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (source: String, rows: Iterator[(String, String)],
         state: GroupState[(Map[String, Long], Long)]) => {
          val (prev, prevTrigger) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          prev.foreach { case (t, c) => m.update(t, c) }
          rows.foreach { case (_, t) => graft.functions.MisraGries.update(m, t, k) }
          val trigger = prevTrigger + 1L
          state.update((m.toMap, trigger))
          m.toArray.sortBy { case (t, c) => (-c, t) }
            .iterator.map { case (t, c) => HeavyHitter(source, t, c, trigger) }
        })
  }

  case class CurriculumMix(source: String, bucket: Long, docs: Long,
                           min_score: Double, max_score: Double, trigger: Long)

  /** Continuous per-source curriculum mix — the streaming face of
    * [[graft.operators.Corpus.curriculumMixBySource]]: which quality
    * buckets each feed is filling, live at ingest (a crawler gone
    * boilerplate drags its source's mass into the low buckets within
    * one trigger — the drift signal the nightly report only shows a
    * day late). Bucket boundaries are FIXED (trained once on the
    * bootstrap corpus via
    * [[graft.operators.Corpus.curriculumBounds]], exactly like the
    * semantic quantizer's centroids): assignment is the SAME pure
    * (score, doc_id) row function as the batch side, map-side
    * against the (k−1)-element literal, so stream and batch can
    * never disagree on a doc's bucket and a re-quantile can never
    * move documents between buckets mid-stream.
    *
    * State per source is ≤ k (docs, min, max) triples FOREVER —
    * bounded by construction on an unbounded stream, the same shape
    * guarantee as [[heavyHittersStream]]'s sketch; counts are exact
    * running totals and min/max are order-independent, so the
    * emitted snapshot equals the batch twin on any delivered prefix
    * (spec-pinned through a kill/restart). Each trigger re-emits the
    * touched source's FULL bucket row set with a state-persisted
    * `trigger` counter — the row-set-per-group shape
    * [[graft.sources.Sinks.streamingGroupReplaceSink]] persists as a
    * live snapshot table (latest-wins on `trigger`). */
  def curriculumMixStream(rawDocuments: DataFrame,
                          bounds: Seq[(Double, Long)]): Dataset[CurriculumMix] = {
    import rawDocuments.sparkSession.implicits._
    rawDocuments
      // score + bucket ride the ingest scan map-side — no join, no
      // extra pass; the SAME shared expressions as the batch twin
      .select(col("source"), col("doc_id"),
        graft.operators.TextOps.qualityScoreCol.as("quality_score"))
      .select(col("source"),
        graft.operators.Corpus.curriculumBucketCol(bounds).as("bucket"),
        col("quality_score"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (source: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[(Map[Long, (Long, Double, Double)], Long)]) => {
          val (prev, prevTrigger) = state.getOption
            .getOrElse((Map.empty[Long, (Long, Double, Double)], 0L))
          val m = scala.collection.mutable.HashMap.empty[Long, (Long, Double, Double)]
          prev.foreach { case (b, s) => m.update(b, s) }
          rows.foreach { case (_, b, score) =>
            m.updateWith(b) {
              case Some((n, mn, mx)) => Some((n + 1L, math.min(mn, score), math.max(mx, score)))
              case None => Some((1L, score, score))
            }
          }
          val trigger = prevTrigger + 1L
          state.update((m.toMap, trigger))
          m.toArray.sortBy(_._1).iterator.map { case (b, (n, mn, mx)) =>
            CurriculumMix(source, b, n, mn, mx, trigger) }
        })
  }

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
