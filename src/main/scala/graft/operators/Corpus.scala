package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators a training-data pipeline runs after
  * cleaning/dedup and before shipping a dataset: rebalancing samples,
  * per-group exemplar selection, corpus-level n-gram statistics and
  * length distributions. All four are deliberately boring Spark —
  * map-side filters, one aggregation, rank-limit windows — because at
  * 100 TB the only operators that survive are the ones Catalyst can
  * push, combine and limit before the shuffle.
  *
  * (The reference's pipeline stops at per-document enrichment; these
  * are the corpus-level steps its output feeds into downstream.)
  */
object Corpus {

  /** Deterministic stratified sample: keep a per-stratum fraction of
    * rows, expressed in 4096ths like [[TextOps.hashSplit]] (3 hex
    * chars of md5, fixed-width lexicographic compare — portable to
    * any engine with md5+substr). The classic use is rebalancing a
    * language-skewed corpus: downsample the dominant language, keep
    * the tail at a higher rate.
    *
    * Same determinism argument as hashSplit: assignment is a pure
    * function of (stratum, key), so re-runs, engine changes and
    * corpus growth never change a kept row's fate — the property
    * `df.sampleBy(seed)` loses the moment partitioning changes.
    * The key is salted with the stratum so a row's draw is
    * independent across strata definitions.
    *
    * Scale shape: a single map-side filter on the scan — no shuffle,
    * no state, no sampleBy driver-side fraction map. */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
                       buckets: Map[String, Int],
                       defaultBuckets: Int): DataFrame = {
    (buckets.values.toSeq :+ defaultBuckets).foreach(b =>
      require(b >= 0 && b <= 4095, s"buckets must be in [0, 4095], got $b"))
    // CASE chain built smallest-stratum-first so the generated plan is
    // deterministic for a given map (ordering only affects the plan
    // text, not semantics — strata arms are mutually exclusive)
    val thresh = buckets.toSeq.sortBy(_._1)
      .foldLeft(lit(f"$defaultBuckets%03x"): Column) {
        case (acc, (s, b)) => when(strata === lit(s), lit(f"$b%03x")).otherwise(acc)
      }
    df.filter(
      substring(md5(concat(strata, lit(":"), key.cast("string"))), 1, 3) < thresh)
  }

  /** Top-k rows per group under a total order — exemplar selection
    * ("the k best documents per language/topic" for eval sets or
    * few-shot pools). The order columns MUST end in a tiebreaker
    * that is unique per group (doc_id) or the selection is
    * nondeterministic under retries.
    *
    * Scale shape: `row_number <= k` is exactly what Spark's
    * WindowGroupLimit pushes below the exchange — each map task keeps
    * only its local top k per group before shuffling, so the shuffle
    * carries O(groups x k) rows, not the corpus. */
  def groupTopK(df: DataFrame, partition: Column, order: Seq[Column],
                k: Int): DataFrame = {
    require(k >= 1)
    df.withColumn("rank",
        row_number().over(Window.partitionBy(partition).orderBy(order: _*)))
      .filter(col("rank") <= k)
  }

  /** Corpus-level bigram frequencies, top `topN` by count — the raw
    * material for boilerplate detection, stopword induction and
    * quality-rule tuning. Tokenization is the same single-space split
    * the rest of the suite uses (see [[TextOps.tokenCount]] parity
    * notes), lowercased.
    *
    * Scale shape: one explode of adjacent token pairs (zip_with over
    * two slices — no self-join, no window), a map-side-combinable
    * count, and a TakeOrdered(topN) — the same shape as a word-count,
    * which is the canonical thing Spark does well. Deterministic
    * output: ties broken by the gram itself. */
  def bigramCounts(documents: DataFrame, topN: Int = 100): DataFrame = {
    require(topN >= 1)
    val t = split(lower(col("text")), " ")
    documents
      .select(t.as("t"))
      .filter(size(col("t")) > 1)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(topN)
  }

  /** Document-length histogram: fixed-width buckets with a capped
    * overflow bucket — the one-glance shape check run on every corpus
    * snapshot (a sudden mass at tiny lengths means the cleaner
    * regressed; a spike in the overflow bucket means concatenated
    * documents slipped through).
    *
    * Scale shape: single map-side-combinable aggregate on a derived
    * key; the bucket count is bounded by construction so the result
    * always fits the driver. */
  def lengthHistogram(documents: DataFrame, width: Long = 50L,
                      maxBucket: Long = 19L): DataFrame = {
    require(width >= 1 && maxBucket >= 0)
    // DIV, not `/`: Column./ is double division and floor(double)
    // drifts near representation boundaries; DIV is exact integer
    // division on BIGINT (DuckDB's `//`)
    documents
      .groupBy(least(expr(s"n_chars DIV $width"), lit(maxBucket)).as("bucket"))
      .agg(count(lit(1)).as("docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .withColumn("bucket_lo", col("bucket") * width)
      .select(col("bucket"), col("bucket_lo"), col("docs"),
        col("min_chars"), col("max_chars"))
  }
}
