package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data text operators (SURVEY §2 #26, #33-36): language ID,
  * quality scoring, token counting, document fingerprinting, exact
  * dedup. All pure Catalyst expressions — one codegen'd projection per
  * operator, no UDFs, no shuffle except the final aggregate of
  * `dedupExact` — so every one of them scales linearly with input
  * splits on a 100 TB corpus.
  */
object TextOps {

  /** Marker ("stopword") sets per language for the n-gram/stopword-hit
    * language-ID heuristic. Disjoint by construction so the argmax is
    * meaningful on any mix. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("merge", "scan"),
    "en" -> Seq("the", "fast"),
    "es" -> Seq("slow", "small"),
    "fr" -> Seq("filter", "stream"),
    "zh" -> Seq("vector", "hash"))

  private def markerHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit("\\b(" + words.mkString("|") + ")\\b")).cast("long")

  /** Language ID: count marker-word hits per language, predict the
    * argmax (ties resolved by language order — a fixed `when` chain, so
    * the decision is deterministic and identical on any engine). */
  def langId(documents: DataFrame): DataFrame = {
    val hit = LangMarkers.map { case (l, ws) => l -> markerHits(col("text"), ws) }.toMap
    val langs = LangMarkers.map(_._1)
    // `when` chain in language order: lang L is predicted when its hit
    // count is >= every later language's (earlier ones already lost).
    val chain = langs.init.foldRight(lit(langs.last)) { (l, elseCol) =>
      val ge = langs.dropWhile(_ != l).tail.map(o => hit(l) >= hit(o)).reduce(_ && _)
      when(ge, l).otherwise(elseCol)
    }
    documents.select(
      (Seq(col("doc_id")) ++
        LangMarkers.map { case (l, _) => hit(l).as(s"${l}_hits") } ++
        Seq(chain.as("predicted_lang"), col("lang").as("meta_lang"))): _*)
  }

  /** [[qualityScore]]'s score as a bare column over `(text,
    * n_chars)` — for consumers that must keep OTHER columns on the
    * same scan (the streaming curriculum view can't afford a
    * stream-stream self-join just to reattach `source`). One
    * definition, so a stream-side score can never drift from the
    * batch/oracle one. */
  def qualityScoreCol: org.apache.spark.sql.Column = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio = regexp_count(col("text"), lit("\\b(the|a)\\b")).cast("double") / nTok
    val lenScore = least(col("n_chars").cast("double") / lit(500.0), lit(1.0))
    lenScore * 0.4 + uniqRatio * 0.3 + (lit(1.0) - stopRatio) * 0.3
  }

  /** Document quality scoring: length saturation, lexical diversity,
    * stopword density (the reference's length/flag heuristics,
    * `/root/reference/airflow_home/dags/sql/process_silver_to_gold.sql:39-41`,
    * generalized to a continuous score). */
  def qualityScore(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    val stopHits = regexp_count(col("text"), lit("\\b(the|a)\\b")).cast("double")
    val stopRatio = stopHits / nTok
    val lenScore = least(col("n_chars").cast("double") / lit(500.0), lit(1.0))
    // Raw doubles, deliberately NOT rounded: both engines compute the
    // identical IEEE value for this expression order, while ROUND(x, 6)
    // introduces decimal half-way boundaries (e.g. 0.6746625) where
    // Spark's and DuckDB's rounding modes disagree by one ulp.
    // Same expression tree as [[qualityScoreCol]].
    val score = qualityScoreCol
    documents.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      uniqRatio.as("unique_ratio"),
      stopRatio.as("stopword_ratio"),
      lenScore.as("length_score"),
      score.as("quality_score"),
      when(score >= 0.6, "high").when(score >= 0.4, "medium").otherwise("low").as("quality_band"))
  }

  /** Java's `\s` spelled out — RE2 (the DuckDB oracle) excludes
    * vertical tab from `\s`, Java includes it, so every oracle-replayed
    * pattern uses this explicit class (same convention as
    * [[graft.operators.Cleaning]] and [[PiiSteps]]). */
  val Ws = " \\t\\n\\x0B\\f\\r"

  /** Token counting: whitespace tokens plus a BPE-ish regex token count
    * (letter runs / digit runs / single other non-space chars). */
  def tokenCount(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit(s"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9$Ws]"))
        .cast("long").as("bpe_tokens"),
      col("n_chars").as("chars"))

  /** Per-source duplication report — which source pollutes the corpus
    * ("dup_docs" = docs whose exact fingerprint appears more than once
    * ANYWHERE in the corpus, cross-source included; "would_drop" =
    * docs a keep-min-id exact dedup would remove). The curation
    * question this answers — drop or downweight a source — comes
    * before any per-document filtering.
    *
    * Scale shape: one fingerprint aggregate and one join, both keyed
    * on the fingerprint (co-partitioned, AQE plans no third corpus
    * exchange), then a source-cardinality-sized rollup. */
  def dupRateBySource(documents: DataFrame): DataFrame = {
    val fps = documents.select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
    val groups = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keeper_id"))
    fps.join(groups, "fp")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("copies") > 1, 1L).otherwise(0L)).as("dup_docs"),
        sum(when(col("doc_id") =!= col("keeper_id"), 1L).otherwise(0L)).as("would_drop"))
      .withColumn("dup_rate",
        col("dup_docs").cast("double") / col("docs").cast("double"))
  }

  /** Per-language tokenizer-fertility report: how many BPE-ish tokens
    * a language costs per whitespace token (and per char) — the
    * statistic that decides per-language mixing budgets when the
    * training budget is counted in tokens, not documents. Fertility is
    * the ratio of corpus SUMS (exact BIGINTs; the one double division
    * is IEEE exact-rounded and association-matched in the oracle),
    * not an average of per-doc ratios — short docs would otherwise
    * dominate. One combinable aggregate over the [[tokenCount]]
    * projections; zero extra shuffles. */
  def langTokenStats(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("ws_tokens"),
        sum(regexp_count(col("text"), lit(s"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9$Ws]"))
          .cast("long")).as("bpe_tokens"),
        sum(col("n_chars")).as("chars"))
      .withColumn("fertility",
        col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"))

  /** Document fingerprinting: raw md5, a normalization-invariant md5
    * (case-folded, whitespace-collapsed), and a 2-hex-char shard key —
    * the bucket a 100 TB dedup job would hash-partition on. */
  def docFingerprint(documents: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), s"[$Ws]+", " "))
    documents.select(
      col("doc_id"),
      md5(col("text")).as("fp_raw"),
      md5(norm).as("fp_norm"),
      substring(md5(col("text")), 1, 2).as("shard"))
  }

  /** Exact dedup ledger: group by content hash, keep the smallest id —
    * the reference's bronze upsert-on-link collapsed to one map-side
    * combinable aggregate (no row_number window needed when only the
    * keeper id and group size are wanted). */
  def dedupExact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("fp"))
      .agg(
        min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("dup_count"))

  /** PII scrubbing patterns, ordered — RE2 ∩ Java regex so the DuckDB
    * oracle replays them verbatim. Whitespace is written as the
    * explicit class `[ \t\n\r\f]` because the engines disagree on
    * `\s` itself (Java includes vertical tab, RE2 does not). URL
    * first: an email-looking token inside a URL should disappear with
    * the URL, not leave `<URL><EMAIL>` fragments.
    *
    * The phone rule requires >= 9 digits joined only by `-`/`(`/`)` —
    * deliberately NOT spaces: with spaces (or at 8 digits) the
    * heuristic swallows ISO dates ("2024-01-02 03:04") and short
    * number lists, corrupting clean text. The cost is that a
    * space-separated phone is only partially redacted (its longest
    * separator-joined digit run). */
  val PiiSteps: Seq[(String, String)] = Seq(
    ("https?://[^ \t\n\r\f]+", "<URL>"),
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\+?(?:[0-9][()\\-]?){8,}[0-9]", "<PHONE>"))

  /** The [[PiiSteps]] chain applied to any text column. */
  def redact(c: Column): Column =
    PiiSteps.foldLeft(c) { case (e, (pat, rep)) => regexp_replace(e, pat, rep) }

  /** Pre-training PII redaction: URLs, emails, phone-shaped digit runs
    * replaced with typed placeholders — a pure codegen'd
    * `regexp_replace` chain, no shuffle, linear at any corpus size. */
  def redactPii(documents: DataFrame): DataFrame = {
    val redacted = redact(col("text"))
    documents.select(
      col("doc_id"),
      redacted.as("redacted"),
      (col("text") =!= redacted).as("had_pii"))
  }

  /** Within-document repetition metrics — the Gopher/C4-style quality
    * rules for pre-training curation: a doc whose token stream keeps
    * repeating itself carries little signal. Pure per-row expressions
    * (no shuffle): duplicate-word fraction and duplicate-bigram
    * fraction, with the n_words denominator for downstream filters. */
  def docRepetition(documents: DataFrame): DataFrame = {
    graft.GraftExtensions.register(documents.sparkSession)
    val w = split(col("text"), " ")
    val words = size(w).cast("long")
    // native one-pass shingle set: the interpreted HOF twin measured
    // 2.2 s for this query at sf0.1 vs ~0.5 s native
    val bigrams = call_function("graft_shingles", col("text"), lit(2))
    documents.select(
      col("doc_id"),
      words.as("n_words"),
      (lit(1.0) - size(array_distinct(w)).cast("double") /
        when(words > 0, words.cast("double"))).as("dup_word_frac"),
      (lit(1.0) - size(bigrams).cast("double") /
        when(words > 1, (words - 1).cast("double"))).as("dup_bigram_frac"))
  }

  /** Character-trigram language-model quality score — the CCNet-style
    * "train a small LM on the corpus, flag the docs it finds
    * improbable" filter, the standard perplexity-filtering step of a
    * training-data pipeline, built to be VALUE-CHECKABLE:
    *
    *  - the model is the corpus's own char-trigram table with add-one
    *    smoothing: `P(c|ab) = (C(abc)+1) / (C(ab)+S)` where `C(ab)`
    *    is DERIVED as `Σ_c C(abc)` (denominators consistent with the
    *    numerators by construction) and `S` is the alphabet size seen
    *    in third-position chars. The table is INTRINSICALLY BOUNDED —
    *    ≤ |Σ|³ rows regardless of corpus size — so at 100 TB the
    *    model is a broadcastable side table and training is one
    *    map-combinable count aggregate; no cap, no sampling.
    *  - the score is the LINEAR mean conditional probability
    *    `Σ n·P / N` (plus `rare_tri`, the count of trigram positions
    *    with P < 1e-3 — the "surprising characters" integer). Linear,
    *    not log-perplexity, for the same reason `topic_terms` uses
    *    linear idf: log is not IEEE exact-rounded cross-engine, while
    *    products/divisions are — so the whole score replays bit-for-
    *    bit in the oracle. Ranking quality: low mean-probability and
    *    high rare_tri flag the same garbled/boilerplate docs a
    *    perplexity rank flags.
    *  - `deterministic = true` (the registered path) folds each doc's
    *    `n·P` terms in trigram order (sorted-collect `aggregate`, the
    *    kmeans re-center convention) so the double sum is independent
    *    of partitioning; the default plain `sum` is map-side
    *    combinable for production runs that don't need bit-stability.
    */
  def charlmScore(documents: DataFrame,
                  rareBelow: Double = 0.001,
                  deterministic: Boolean = false): DataFrame =
    charlmScoreAgainst(documents, documents, rareBelow, deterministic)

  /** Per-doc trigram multiset: positions 1..len-2, character-based
    * (both engines' substring/length count characters, not bytes).
    * Native one-pass extraction ([[graft.functions.CharNgrams]],
    * spec-pinned == the interpreted HOF form it replaced, which
    * dominated the charlm rows' profile). */
  private def triRollup(documents: DataFrame): DataFrame = {
    graft.GraftExtensions.register(documents.sparkSession)
    documents
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        explode(call_function("graft_char_ngrams", col("text"), lit(3))).as("tri"))
      .groupBy(col("doc_id"), col("tri"))
      .agg(count(lit(1)).as("n"))
  }

  /** A corpus batch's aggregated trigram counts `(tri, n)` — the rows
    * the incremental charlm arm appends per ingest day (bounded by
    * |Σ|³ whatever the batch size) and sums back into the model
    * ([[charlmScoreAgainstModel]]'s `c3`). Training never needs the
    * scoring join path's per-doc rollup SHUFFLE, so each doc's
    * distinct-trigram rollup is computed map-side as packed longs
    * ([[graft.functions.CharlmDocCounts]] — no per-position string
    * allocation), the ordinary `groupBy(tri)` merges DISTRIBUTED
    * (partial-agg bounded at |Σ|³ per task; a single global typed
    * aggregate would funnel every partition's map through one merge
    * task — unacceptable exactly at the CJK-scale alphabets the
    * scoring fallback exists for), and the trigram STRINGS are
    * recovered only on the |Σ|³-bounded aggregated rows. */
  def charlmCounts(documents: DataFrame): DataFrame = {
    graft.GraftExtensions.register(documents.sparkSession)
    documents
      .filter(length(col("text")) >= 3)
      .select(explode(call_function("graft_charlm_doc_counts", col("text"))).as("c"))
      .groupBy(col("c.tri").as("tp"))
      .agg(sum(col("c.n")).as("n"))
      .select(call_function("graft_charlm_unpack", col("tp")).as("tri"), col("n"))
  }

  /** Compact the incremental charlm count table
    * ([[graft.Pipeline.runIncremental]]'s `charlmTable`): one row set
    * per ingest day keeps appends bounded, but over years the table
    * carries days × |Σ|³ rows while the MODEL only needs the per-
    * trigram sums. The recap re-aggregates everything into a single
    * `recap` append id — same totals, days collapsed — through the
    * STAGED bucketed rewrite ([[graft.sources.Sinks.rewriteBucketed]]
    * + `recoverTableSwap`), so the live table is intact until the
    * swap and an executor loss mid-rewrite cannot destroy the only
    * copy (the discipline the chunk-index recap follows). Safe to run
    * any time the daily ingest is not mid-append. */
  def recapCharlmCounts(spark: org.apache.spark.sql.SparkSession, table: String,
                        buckets: Int = 64): Unit = {
    val summed = spark.table(table)
      .groupBy(col("tri")).agg(sum(col("n")).as("n"))
      .withColumn("append_id", lit("recap"))
    graft.sources.Sinks.rewriteBucketed(summed, table, Seq("tri"), buckets)
  }

  /** The CROSS-CORPUS form — the true CCNet shape: the model trains
    * on a REFERENCE corpus (the clean data you trust) and scores
    * CANDIDATE docs against it, so "improbable" means "unlike the
    * reference", not "unlike yourself". [[charlmScore]] is the
    * self-scoring special case (candidates == reference).
    *
    * Unseen mass needs no special-casing: with null counts coalesced
    * to 0, the single smoothed formula `P = (C(abc)+1) / (C(ab)+S)`
    * yields `1/(C(ab)+S)` for an unseen trigram over a seen bigram
    * and `1/S` for an unseen bigram — standard add-one behavior, and
    * exactly what the oracle's LEFT JOIN + COALESCE replays. */
  def charlmScoreAgainst(candidates: DataFrame, reference: DataFrame,
                         rareBelow: Double = 0.001,
                         deterministic: Boolean = false): DataFrame =
    charlmScoreAgainstModel(candidates,
      charlmCounts(reference).select(col("tri"), col("n").as("c3")),
      rareBelow, deterministic)

  /** Score against an ALREADY-AGGREGATED trigram model `(tri, c3)` —
    * what [[charlmScoreAgainst]] builds from a reference corpus and
    * what [[graft.Pipeline.runIncremental]]'s charlm arm reads from
    * its persisted count table. The conditioning bigram counts and
    * the alphabet size DERIVE from the model (`C(ab) = Σ_c C(abc)`,
    * `S` = distinct third chars), so a persisted model is just the
    * one table and the smoothing can never disagree with it.
    *
    * EAGER at construction: this method runs a driver limit+collect
    * job over `c3In` ([[charlmCollectModel]]) BEFORE returning, and
    * the returned plan carries the collected model as a literal — a
    * snapshot of the model table as of this call, not a
    * read-at-action view (callers building plans ahead of execution,
    * or expecting a later model append to be visible, must rebuild
    * the frame — the streaming preview sink's per-file-set cache does
    * exactly that). Over the row cap the collect still runs (cap+1
    * probe rows) but the returned join-path plan is lazy as usual. */
  def charlmScoreAgainstModel(candidates: DataFrame, c3In: DataFrame,
                              rareBelow: Double = 0.001,
                              deterministic: Boolean = false,
                              maxModelRows: Int = 1 << 20): DataFrame = {
    val c3 = c3In.select(col("tri"), col("c3"))
    // Fast path: the model is |Σ|³-bounded, so for ASCII-ish corpora
    // it collects to a few-MB driver object whatever the corpus size
    // — score each doc in ONE map-side expression. Over the cap (a
    // CJK-scale realized alphabet — the literal-budget hazard the
    // join path's broadcast-hint refusal documents) fall through to
    // the join path, which shuffles but never collects. Callers keep
    // `doc_id` unique per candidates row (every registered caller
    // scores a documents table); the GATE form that may legitimately
    // see duplicates pools integer stats in [[charlmRareDropIds]].
    charlmCollectModel(c3, maxModelRows) match {
      case Some(bytes) => return charlmScoreWithModel(candidates, bytes, rareBelow)
      case None => ()
    }
    val c2 = c3.groupBy(substring(col("tri"), 1, 2).as("bi")).agg(sum(col("c3")).as("c2"))
    val s = c3.agg(countDistinct(substring(col("tri"), 3, 1)).as("sz"))
    val tris = triRollup(candidates)
    // the model frames are |Σ|³- and |Σ|²-bounded — small for an
    // ASCII-ish corpus, but the REALIZED bound follows the corpus's
    // alphabet (a CJK corpus reaches 10⁷⁺ distinct trigrams), so a
    // static broadcast hint here would bypass AQE's size checks and
    // OOM the driver at exactly the corpora the bound stops helping
    // (r18 review). Leave c3/c2 to AQE — it broadcasts them at
    // runtime whenever they actually fit; only the 1-row alphabet
    // size is hinted.
    val scored = tris
      .join(c3, Seq("tri"), "left")
      .join(c2, substring(tris("tri"), 1, 2) === c2("bi"), "left")
      .crossJoin(broadcast(s))
      .withColumn("p",
        (coalesce(col("c3"), lit(0L)).cast("double") + 1.0) /
          (coalesce(col("c2"), lit(0L)).cast("double") + col("sz").cast("double")))
      .withColumn("t", col("n") * col("p"))
    graft.GraftExtensions.register(candidates.sparkSession)
    val psum =
      if (deterministic)
        // native string-keyed sorted fold
        // ([[graft.functions.SortedFoldSumStr]]) — bit-identical to
        // the declarative array_sort(collect_list) chain it replaces
        call_function("graft_sorted_fold_sum_str", col("tri"), col("t"))
      else sum(col("t"))
    scored.groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tri"),
        psum.as("psum"),
        coalesce(sum(when(col("p") < rareBelow, col("n"))), lit(0L)).as("rare_tri"))
      .select(col("doc_id"), col("n_tri"),
        (col("psum") / col("n_tri")).as("mean_char_prob"), col("rare_tri"))
  }

  /** Collect an aggregated `(tri, c3)` model to the
    * [[graft.functions.CharlmModel]] wire bytes — `None` when the
    * realized trigram table exceeds `maxModelRows` (detected by
    * probing cap+1 rows, never by counting the whole table). The
    * bytes are what [[charlmScoreWithModel]] scores against and what
    * a steady caller (the streaming accept-preview sink) CACHES
    * across micro-batches keyed on the model table's file set — the
    * same re-read-only-on-change discipline as its bloom probes. */
  def charlmCollectModel(c3In: DataFrame, maxModelRows: Int = 1 << 20): Option[Array[Byte]] = {
    // collect the trigram KEY as raw utf8 bytes (cast to binary IS
    // UTF8String.getBytes), not a java String: getString round-trips
    // through UTF-16 and folds invalid byte sequences to U+FFFD — two
    // byte-distinct malformed trigrams must stay distinct on the wire
    // like they are in the join path
    val capped = c3In.select(col("tri").cast("binary"), col("c3"))
      .limit(maxModelRows + 1).collect()
    if (capped.length > maxModelRows) None
    else Some(graft.functions.CharlmModel.serialize(capped.iterator.map { r =>
      (r.getAs[Array[Byte]](0), r.get(1).asInstanceOf[Number].longValue())
    }.toArray))
  }

  /** Score candidates against collected model bytes in ONE map-side
    * expression ([[graft.functions.CharlmDocScore]]): the trigram
    * explode (`len-2` rows/doc), the per-doc rollup shuffle, both
    * model joins and the fold aggregate all collapse into a single
    * pass over the corpus scan — zero shuffle, model as a foldable
    * plan literal. Bit-identical to the deterministic join path
    * (spec-pinned): same IEEE ops, same ascending-byte fold order. */
  def charlmScoreWithModel(candidates: DataFrame, modelBytes: Array[Byte],
                           rareBelow: Double = 0.001): DataFrame = {
    graft.GraftExtensions.register(candidates.sparkSession)
    candidates.filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        call_function("graft_charlm_doc_score",
          lit(modelBytes), col("text"), lit(rareBelow)).as("s"))
      .select(col("doc_id"),
        col("s.n_tri").as("n_tri"),
        (col("s.psum") / col("s.n_tri")).as("mean_char_prob"),
        col("s.rare_tri").as("rare_tri"))
  }

  /** The charlm QUALITY GATE's drop set — doc-ids whose rare-trigram
    * fraction exceeds `maxFrac`. The naive declarative form
    * (`filter(rare_tri / n_tri > maxFrac)` straight over the fast
    * scored frame) triple-evaluates the per-doc scorer once predicate
    * pushdown substitutes the struct fields (measured 3 plan
    * occurrences, ~2× the single-pass wall at sf0.1). Here the struct
    * is projected ONCE (two non-cheap field references block
    * CollapseProject — spec-pinned) and the gate's INTEGER stats pool
    * per doc_id through one delta-sized 3-column exchange, with the
    * frac filter sitting ABOVE the aggregate where pushdown cannot
    * substitute into it.
    *
    * Pooling is not just the cheap shape — it is the join path's
    * SEMANTICS: `triRollup` groups by (doc_id, tri), so a doc_id that
    * appears on several candidate rows (a twice-delivered id in one
    * delta — the gate runs BEFORE every dedup/id arm) scores as ONE
    * pooled trigram multiset. `n_tri`/`rare_tri` are linear in that
    * multiset (P depends only on the model), so per-row sums ARE the
    * pooled values, bit-exact — integers. The frac division is the
    * same IEEE op the oracle's `rare_frac` CTE replays; candidates
    * shorter than 3 chars never enter the drop set.
    *
    * `modelBytes` is the steady-caller seam (Some(cached) from the
    * streaming preview sink's per-file-set cache; None = collect here
    * via [[charlmCollectModel]]). An over-cap model (inner None)
    * falls back to the join-path scored frame, where the filter also
    * sits above an aggregate — no re-evaluation hazard there. */
  def charlmRareDropIds(candidates: DataFrame, c3In: => DataFrame,
                        rareBelow: Double, maxFrac: Double,
                        modelBytes: Option[Option[Array[Byte]]] = None,
                        maxModelRows: Int = 1 << 20): DataFrame = {
    val bytes = modelBytes.getOrElse(charlmCollectModel(c3In, maxModelRows))
    bytes match {
      case Some(b) =>
        graft.GraftExtensions.register(candidates.sparkSession)
        candidates.filter(length(col("text")) >= 3)
          .select(col("doc_id"),
            call_function("graft_charlm_doc_score",
              lit(b), col("text"), lit(rareBelow)).as("s"))
          .groupBy(col("doc_id"))
          .agg(sum(col("s.n_tri")).as("n_tri"),
            sum(col("s.rare_tri")).as("rare_tri"))
          .filter(col("rare_tri").cast("double") / col("n_tri") > maxFrac)
          .select(col("doc_id"))
      case None =>
        charlmScoreAgainstModel(candidates, c3In, rareBelow, maxModelRows = 0)
          .filter(col("rare_tri").cast("double") / col("n_tri") > maxFrac)
          .select(col("doc_id"))
    }
  }

  /** Deterministic hash split — the train/holdout assignment step of a
    * training-data pipeline (the sibling of [[decontaminate]]: split
    * first, then verify no leakage). Assignment is a pure function of
    * the key via md5, so it is stable under re-runs, engine changes,
    * cluster resizing, and corpus growth (a doc never migrates between
    * splits when new data arrives — the property random `sample()`
    * loses). Granularity is 1/4096 (3 hex chars); the comparison is
    * LEXICOGRAPHIC on fixed-width lowercase hex, which equals the
    * numeric compare and needs no hex-to-int conversion (portable to
    * any engine with md5 + substr). Zero shuffle, zero state. */
  def hashSplit(df: DataFrame, key: Column, testBuckets: Int = 410): DataFrame = {
    // 4095 max: 4096 would format to 4 hex chars and break the
    // fixed-width lexicographic compare ("fff" > "1000")
    require(testBuckets >= 0 && testBuckets <= 4095,
      "testBuckets is out of 4096 (0 to 4095)")
    df.withColumn("split",
      when(substring(md5(key.cast("string")), 1, 3) < lit(f"$testBuckets%03x"), "test")
        .otherwise("train"))
  }

  /** Per-split corpus statistics over [[hashSplit]] — the sanity view
    * run right after splitting (sizes near the target fraction,
    * length/lang distributions comparable across splits). */
  def hashSplitStats(documents: DataFrame, testBuckets: Int = 410): DataFrame =
    hashSplit(documents, col("doc_id"), testBuckets)
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("docs"),
        graft.functions.Exact.avgLong(col("n_chars")).as("avg_chars"),
        countDistinct(col("lang")).as("langs"))

  /** Split-balance audit: per (split, lang), the stratum's share of
    * its split — a holdout whose language mix diverges from train
    * means the eval measures distribution shift, not model quality.
    * An md5 split is unstratified by design, so this is the CHECK that
    * its law-of-large-numbers balance actually held on a given corpus
    * (at small corpus sizes it can drift — that is the point of
    * auditing rather than assuming). Shares are exact integer ratios;
    * the whole report is two combinable aggregates over the rollup
    * (the window sees split-cardinality rows, never the corpus). */
  def splitBalance(documents: DataFrame, testBuckets: Int = 410): DataFrame = {
    val byCell = hashSplit(documents, col("doc_id"), testBuckets)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("docs"))
    val w = Window.partitionBy(col("split"))
    byCell
      .withColumn("split_docs", sum(col("docs")).over(w))
      .withColumn("share", col("docs").cast("double") / col("split_docs").cast("double"))
      .select(col("split"), col("lang"), col("docs"), col("split_docs"), col("share"))
  }

  /** Leakage-free split: a doc's split is decided by its near-dup
    * CLUSTER, not by itself. Under a plain [[hashSplit]] two near-
    * duplicates can straddle train/test, and the held-out copy then
    * measures memorization of its twin rather than generalization —
    * the classic split-leakage failure near-dup detection exists to
    * prevent. Hashing `coalesce(cluster_id, doc_id)` puts every
    * member of a component in the SAME split, and leaves unclustered
    * docs (the overwhelming majority) exactly where [[hashSplit]]
    * would put them. The cluster table is pair-graph-sized, so it
    * rides a broadcast left join: the split is still a map-side
    * projection over the corpus scan — zero corpus shuffle. */
  def clusterSafeSplit(documents: DataFrame, clusters: DataFrame,
                       testBuckets: Int = 410): DataFrame =
    hashSplit(
      documents.join(
        broadcast(clusters.select(col("doc_id"), col("cluster_id"))),
        Seq("doc_id"), "left"),
      coalesce(col("cluster_id"), col("doc_id")), testBuckets)

  /** Per-split sanity view over [[clusterSafeSplit]] — sizes plus how
    * many clustered docs / distinct clusters each split absorbed (the
    * pair of columns a leakage audit reads: a cluster id appearing
    * under two splits is the failure this operator exists to rule
    * out, and the spec pins that it cannot). */
  def clusterSafeSplitStats(documents: DataFrame, clusters: DataFrame,
                            testBuckets: Int = 410): DataFrame =
    clusterSafeSplit(documents, clusters, testBuckets)
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("docs"),
        count(col("cluster_id")).as("clustered_docs"),
        countDistinct(col("cluster_id")).as("clusters"))

  /** Train/test decontamination: flag corpus docs sharing >= `minOverlap`
    * distinct k-gram shingles with a benchmark set (the standard
    * n-gram-overlap decontamination of LLM training corpora).
    *
    * The benchmark side is tiny by nature (eval sets, not corpora) —
    * its DISTINCT shingles broadcast, the corpus explode+semi-join is
    * map-side, and the only shuffle is the per-doc overlap count.
    * Returns one row per contaminated doc. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    minOverlap: Long = 1L): DataFrame = {
    val corpusShingles = Dedup.shingleRows(corpus)
    val benchShingles = Dedup.shingleRows(benchmark)
      .select(col("shingle")).distinct()
    corpusShingles
      .join(broadcast(benchShingles), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("overlap_shingles"))
      .filter(col("overlap_shingles") >= minOverlap)
  }

  /** Substring-level decontamination — the content-defined-chunk twin
    * of [[decontaminate]]: a training doc is contaminated when it
    * shares ≥ `minSharedTokens` tokens' worth of WHOLE chunks
    * ([[Dedup.cdcChunks]]) with the benchmark. Shingle overlap fires
    * on any 3 common tokens; chunk overlap fires on verbatim spans of
    * ~chunk length, at one fingerprint per ~8 tokens instead of one
    * per token — the production pattern runs both: shingles for
    * short-span leakage, chunks for passage-level copies.
    *
    * Unlike [[decontaminate]] (whose benchmark is an eval set, tiny by
    * nature, and explicitly broadcast), this one deliberately does NOT
    * hint the join: its benchmark can be a HOLDOUT SPLIT — 10% of a
    * 100 TB corpus in [[graft.Pipeline.runTrainingPrep]] — where a
    * forced broadcast would OOM the driver. AQE picks broadcast when
    * the fingerprint set is actually small and a shuffled semi-join
    * (linear, chunk_hash-keyed) when it is not. */
  def decontaminateSubstring(corpus: DataFrame, benchmark: DataFrame,
                             minSharedTokens: Long = 8L,
                             maxDocFreq: Long = 100L): DataFrame = {
    require(minSharedTokens >= 1 && maxDocFreq >= 1 && maxDocFreq <= Int.MaxValue)
    graft.GraftExtensions.register(corpus.sparkSession)
    // BOILERPLATE BOUND, same rule as substringDupPairs: a chunk
    // appearing in > maxDocFreq corpus docs is a stock phrase of the
    // language, not contamination signal — on natural text a large
    // holdout contains essentially every common chunk, so without the
    // cap ordinary docs would accumulate >= minSharedTokens of
    // boilerplate and be spuriously dropped from train. The cap rides
    // the same hard-bounded collect (heavy chunks collapse to NULL in
    // ONE aggregate — no df join).
    val postings = Dedup.uniqueChunks(corpus).groupBy(col("chunk_hash"))
      .agg(call_function("graft_bounded_collect",
        col("doc_id"), lit(maxDocFreq.toInt)).as("ds"),
        max(col("n_tokens")).as("n_tokens"))
      .filter(col("ds").isNotNull)
    val benchChunks = Dedup.cdcChunks(benchmark)
      .select(col("chunk_hash")).distinct()
    postings
      .join(benchChunks, Seq("chunk_hash"), "left_semi")
      .select(col("n_tokens"), explode(col("ds")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared_chunks"),
        sum(col("n_tokens")).as("shared_tokens"))
      .filter(col("shared_tokens") >= minSharedTokens)
  }

  /** The combined contamination view — [[decontaminate]] (short-span
    * shingle leakage) and [[decontaminateSubstring]] (verbatim
    * passage copies) full-outer-joined into ONE per-doc verdict
    * table: evidence from both arms side by side plus which arm(s)
    * fired. This is the table a curation run actually consults — the
    * arms catch DIFFERENT contamination (3 shared tokens vs whole
    * chunks; a paraphrase trips shingles but not chunks, a quoted
    * passage in fresh prose trips chunks at high weight), and acting
    * on either alone means re-deriving the other later over the full
    * corpus. Scale shape: both inputs are contaminated-doc-sized (each
    * already bounded by its arm), so the full-outer join is tiny; the
    * corpus-scale work happens once inside each arm, unchanged. */
  def decontamReport(corpus: DataFrame, benchmark: DataFrame,
                     minOverlap: Long = 1L, minSharedTokens: Long = 8L,
                     maxDocFreq: Long = 100L): DataFrame = {
    val o = decontaminate(corpus, benchmark, minOverlap)
    val s = decontaminateSubstring(corpus, benchmark, minSharedTokens, maxDocFreq)
    o.join(s, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("overlap_shingles"), lit(0L)).as("overlap_shingles"),
        coalesce(col("shared_chunks"), lit(0L)).as("shared_chunks"),
        coalesce(col("shared_tokens"), lit(0L)).as("shared_tokens"),
        when(col("overlap_shingles").isNotNull && col("shared_chunks").isNotNull, "both")
          .when(col("overlap_shingles").isNotNull, "ngram")
          .otherwise("substring").as("flagged_by"))
  }

  /** The Gopher document-quality rule set (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", table A1) — the published heuristic battery most
    * curation pipelines start from, adapted to a token-stream corpus
    * (the line-based bullet/ellipsis-prefix rules have no lines to
    * apply to here):
    *   - word count within [minWords, maxWords]
    *   - mean word length within [3, 10]
    *   - symbol-to-word ratio ('#' or '...') below 0.1
    *   - >= 80% of words contain at least one alphabetic character
    *   - at least 2 distinct members of a small stopword list appear
    *
    * Emits every intermediate measure plus per-rule booleans so a
    * curation run can relax one rule without recomputing the corpus
    * pass, and `gopher_pass` as the conjunction. Scale shape: a pure
    * projection — one corpus scan, zero shuffles, every expression
    * codegen'd; at 100 TB this runs at scan speed alongside the other
    * map-only triage columns.
    *
    * Parity note: thresholds compare STRICTLY except the documented
    * closed bounds, and all ratios are exact IEEE divisions of integer
    * counts (same cross-engine determinism argument as
    * [[qualityScore]]). Mean word length uses the single-space token
    * convention of this corpus: chars excluding separators =
    * n_chars - (n_words - 1). */
  def gopherRules(documents: DataFrame,
                  minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val g = gopherCols(minWords, maxWords)
    documents.select(
      col("doc_id"),
      col("source"),
      g.nWords.as("n_words"),
      g.mwl.as("mean_word_len"),
      g.symbolRatio.as("symbol_ratio"),
      g.alphaRatio.as("alpha_ratio"),
      g.stopHits.as("stop_hits"),
      g.passWords.as("pass_words"),
      g.passMwl.as("pass_mwl"),
      g.passSymbol.as("pass_symbol"),
      g.passAlpha.as("pass_alpha"),
      g.passStops.as("pass_stops"),
      g.passAll.as("gopher_pass"))
  }

  /** The rule expressions behind [[gopherRules]], shared with
    * [[gopherFilter]] so the report and the gate can never disagree
    * on what "pass" means. */
  private final case class GopherColumns(nWords: Column, mwl: Column,
                                         symbolRatio: Column, alphaRatio: Column,
                                         stopHits: Column, passWords: Column,
                                         passMwl: Column, passSymbol: Column,
                                         passAlpha: Column, passStops: Column) {
    def passAll: Column = passWords && passMwl && passSymbol && passAlpha && passStops
  }

  private def gopherCols(minWords: Long, maxWords: Long): GopherColumns = {
    val toks = split(col("text"), " ")
    val nWords = size(toks).cast("long")
    val mwl = (col("n_chars") - (nWords - lit(1L))).cast("double") / nWords.cast("double")
    val symbolRatio = regexp_count(col("text"), lit("#|\\.\\.\\."))
      .cast("double") / nWords.cast("double")
    val alphaRatio = size(filter(toks, w => w.rlike("[a-zA-Z]")))
      .cast("double") / nWords.cast("double")
    val stopHits = GopherStops.map(w =>
      when(col("text").rlike(s"\\b$w\\b"), 1L).otherwise(0L))
      .reduce(_ + _)
    GopherColumns(nWords, mwl, symbolRatio, alphaRatio, stopHits,
      passWords = nWords >= minWords && nWords <= maxWords,
      passMwl = mwl >= 3.0 && mwl <= 10.0,
      passSymbol = symbolRatio < 0.1,
      passAlpha = alphaRatio > 0.8,
      passStops = stopHits >= 2L)
  }

  /** The FILTER twin of [[gopherRules]]: documents that pass the full
    * battery flow through with every input column intact, the rest
    * drop — the shape an ingest pipeline actually applies (the report
    * is for deciding thresholds; this enforces them). A stateless,
    * shuffle-free projection+filter, so the identical transform runs
    * on an unbounded frame
    * ([[graft.streaming.Streams.qualityGateStream]]). */
  def gopherFilter(documents: DataFrame,
                   minWords: Long = 50L, maxWords: Long = 100000L): DataFrame =
    documents.filter(gopherCols(minWords, maxWords).passAll)

  /** Per-source curation report over [[gopherRules]]: how much of each
    * source survives the battery, and WHICH rule kills it — the
    * decide-per-source view (drop, downweight, or fix the extractor)
    * that runs before any per-document filtering, same curation
    * altitude as [[dupRateBySource]]. Pass rate is one exact integer
    * ratio; per-rule failure counts are conditional BIGINT sums on the
    * same single corpus scan (the rules projection fuses into this
    * aggregate — no second pass, no join). */
  def gopherReport(documents: DataFrame): DataFrame = {
    def fails(c: String) = sum(when(!col(c), 1L).otherwise(0L)).as(s"fail_${c.stripPrefix("pass_")}")
    gopherRules(documents)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("gopher_pass"), 1L).otherwise(0L)).as("passed"),
        fails("pass_words"), fails("pass_mwl"), fails("pass_symbol"),
        fails("pass_alpha"), fails("pass_stops"))
      .withColumn("pass_rate", col("passed").cast("double") / col("docs").cast("double"))
  }

  /** Stopword probe list for [[gopherRules]] — the 8-word function-word
    * set from the paper's rule ("the, be, to, of, and, that, have,
    * with"). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
}
