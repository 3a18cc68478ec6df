package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV bulk-ingest source — the format every upstream export lands in
  * sooner or later. Same contract as [[JsonSource]]: EXPLICIT schema
  * (header inference reads the file twice and types drift per file),
  * and a quarantining variant that keeps the batch alive when a
  * producer ships malformed rows.
  */
object CsvSource {

  /** Batch CSV reader with declared schema; header row skipped by
    * name-match, multiline quoting on (the setting that breaks most
    * naive ingests: embedded newlines in quoted text fields). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header)
      .option("delimiter", delimiter)
      .option("multiLine", true)
      .option("escape", "\"")
      .csv(path)

  /** Quarantining CSV reader: (parsed, rejects) — PERMISSIVE parse
    * with malformed rows routed to an addressable frame, same
    * reasoning as [[JsonSource.readJsonQuarantine]]. */
  def readCsvQuarantine(spark: SparkSession, path: String, schema: StructType,
                        header: Boolean = true,
                        delimiter: String = ","): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read.schema(withCorrupt)
      .option("header", header)
      .option("delimiter", delimiter)
      .option("multiLine", true)
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      // one eager parse shared by both split frames. localCheckpoint,
      // NOT cache(): cached plans are pinned by the session's
      // CacheManager until an explicit unpersist — repeated ingest
      // batches in a long-lived session would leak blocks — while
      // checkpoint blocks are auto-released by the ContextCleaner once
      // the returned frames become unreachable. Trade-off accepted for
      // an ingest batch: checkpoint blocks are unreplicated and the
      // lineage back to the files is cut, so losing an executor
      // mid-batch means re-running readCsvQuarantine, not transparent
      // recompute — the right failure mode for a bounded ingest step,
      // the wrong one for a long-lived derived dataset.
      .localCheckpoint()
    val good = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, bad)
  }
}
