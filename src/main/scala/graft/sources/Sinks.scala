package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Sinks (SURVEY §2 #43) — the analogs of the reference's PG upsert
  * (`/root/reference/services/batch_pg.py:114`) and batched ES bulk
  * flush (`/root/reference/processor/es_streamer.py`).
  */
object Sinks {

  /** Partitioned parquet write: partition columns become directory
    * keys, so downstream readers partition-prune instead of scanning —
    * the storage layout that replaces the reference's per-row upsert
    * at scale. `maxRecordsPerFile` bounds file size so a skewed
    * partition can't produce a multi-GB file. */
  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                   maxRecordsPerFile: Long = 5000000L): Unit = {
    val w = df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Bucketed table write: rows are hash-clustered into `buckets`
    * files per partition on `bucketCols`, and the layout is recorded
    * in the catalog. A later join or aggregation on the bucket
    * columns consumes the files' clustering directly — NO shuffle of
    * the fact table at read time (spec-verified: the bucketed
    * fact⋈fact join plan has zero Exchanges). This is the
    * pre-partitioning story for 100 TB fact-to-fact joins that are
    * too big to broadcast and too frequent to re-shuffle per query:
    * pay the shuffle once at write, never at read.
    * `saveAsTable` is required — bucket metadata lives in the
    * catalog, a bare path write would lose it. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int = 64): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** JDBC writer configured like the reference's batched PG loader:
    * rewriteBatchedStatements + explicit batch size. Returned
    * unexecuted (no database in this environment) — callers `.save()`. */
  def jdbcWriter(df: DataFrame, url: String, table: String,
                 batchSize: Int = 1000): DataFrameWriter[Row] =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .option("isolationLevel", "READ_COMMITTED")
      .mode("append")

  /** Keyed upsert merge (SCD-1): `updates` rows replace same-key rows
    * in `existing`, new keys append — the set semantics of the
    * reference's `ON CONFLICT (id) DO UPDATE` PG loader
    * (`/root/reference/services/batch_pg.py:114`), re-expressed as the
    * bulk merge a columnar lake needs (parquet files are immutable;
    * per-row upsert at 100 TB is a non-starter — you rewrite the
    * affected partitions instead).
    *
    * Shape: one left-anti join keyed on `keys` unioned with `updates`
    * verbatim. The anti-join broadcasts when the update batch is small
    * (the overwhelmingly common case: a day's corrections against a
    * corpus) and falls back to a shuffle join under AQE when it
    * isn't; the surviving `existing` rows stream through map-side.
    * Updates are REQUIRED key-unique (duplicate update keys would make
    * "replace" ambiguous); violations fail fast rather than writing a
    * nondeterministic merge. Pair with [[writeParquet]] partitioned on
    * a date column so only touched partitions rewrite. */
  def mergeUpsert(existing: DataFrame, updates: DataFrame,
                  keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeUpsert needs at least one key column")
    require(existing.columns.sameElements(updates.columns),
      s"schema mismatch: ${existing.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val dupKeys = updates.groupBy(keys.map(updates(_)): _*)
      .count().filter("count > 1").limit(1).count()
    require(dupKeys == 0L, "update batch has duplicate keys — replace is ambiguous")
    existing.join(updates.select(keys.map(updates(_)): _*), keys, "left_anti")
      .unionByName(updates)
  }

  /** Streaming parquet sink with checkpointing — exactly-once file
    * output, the streaming twin of [[writeParquet]]. Returned
    * unstarted — callers `.start()`. */
  def streamingParquetSink(df: DataFrame, path: String,
                           checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
