package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Search surface of the reference: PG ILIKE keyword search
  * (`/root/reference/services/batch_pg.py:293-298`) and Elasticsearch
  * `multi_match` ranked search with a `title^3` boost + filters
  * (`/root/reference/services/es.py:166-240`).
  *
  * ES's BM25 machinery is replaced by an explicit, deterministic
  * term-frequency score computed with codegen'd `regexp_extract_all` —
  * the semantics the reference relies on (title matches dominate, more
  * mentions rank higher) without a black-box scorer. Every predicate is
  * a plain `Column` filter, so Catalyst pushes the cheap ones
  * (lang/chars range) into the parquet scan and the scan stays pruned
  * to the referenced columns.
  */
object Search {

  /** Opt-in analyzer chain — the reference indexes BOTH title and
    * content through `indonesian_analyzer` (lowercase filter +
    * Indonesian stopword filter, `/root/reference/services/es.py:46-57`),
    * so its search is case-insensitive and stopword-blind. graft's
    * default (no analyzer) scores raw tokens — case-sensitive, which
    * keeps `contains` pushdown-friendly; passing an analyzer reproduces
    * the ES behavior: the text side is lowercased and query terms are
    * lowercased with stopwords dropped. A query whose analyzed token
    * stream is EMPTY matches nothing — exactly what ES returns when the
    * analyzer eats every query token.
    *
    * One definition shared by every scorer AND the corpus-statistics
    * operators ([[graft.operators.TextOps]] `topicTerms`/`bigramCounts`
    * accept the same analyzer), so search and corpus stats agree on
    * tokenization. */
  final case class Analyzer(stopwords: Set[String]) {
    /** Normalized text column every scorer matches against. */
    def normalize(text: Column): Column = lower(text)
    /** Analyzed query: lowercased, stopwords removed, order kept. */
    def terms(ts: Seq[String]): Seq[String] =
      ts.map(_.toLowerCase(java.util.Locale.ROOT)).filterNot(stopwords.contains)
    /** Analyzed token stream of a text column — single-space split of
      * the normalized text with stopword tokens removed. The
      * column-side twin of [[terms]] (spec-pinned to agree), shared by
      * the corpus-statistics operators so search and corpus stats see
      * the same tokens. The stopword array is a sorted literal: a
      * deterministic, broadcast-free constant in the codegen'd filter. */
    def tokens(text: Column): Column = {
      val stops = array(stopwords.toSeq.sorted.map(lit): _*)
      filter(split(normalize(text), " "), t => !array_contains(stops, t))
    }
  }

  object Analyzer {
    /** High-frequency core of Lucene's public Indonesian stopword set
      * (what the reference's `indonesian_analyzer` loads); callers
      * needing the full ~750-entry list pass their own. */
    val indonesian: Analyzer = Analyzer(Set(
      "yang", "dan", "di", "dari", "ini", "itu", "dengan", "untuk",
      "pada", "ke", "adalah", "dalam", "tidak", "akan", "juga", "ada",
      "sebagai", "saat", "oleh", "karena", "kata", "bisa", "tersebut"))
    /** English stopword core, for English corpora. */
    val english: Analyzer = Analyzer(Set(
      "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
      "with", "is", "are", "was", "were", "be", "this", "that", "it"))
  }

  /** Word-boundary term frequency — `\b` is common Java-regex/RE2.
    * `regexp_count` counts matches without materializing the match
    * array that `size(regexp_extract_all(...))` would allocate per
    * row. The term is quoted (`\Q…\E`, also RE2-compatible) so user
    * input like `c++` or `2.0` is matched literally instead of being
    * interpreted as (possibly invalid) regex syntax. */
  def termFrequency(text: Column, term: String): Column =
    regexp_count(text, lit("\\b" + java.util.regex.Pattern.quote(term) + "\\b")).cast("long")

  /** Escape LIKE/ILIKE metacharacters in user input. */
  private def likeEscape(term: String): String =
    term.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")

  /** The corpus has no separate title column; the reference boosts
    * `title^3`, we treat the leading 80 chars as the title zone. */
  def titleZone(text: Column): Column = substring(text, 1, 80)

  /** ILIKE keyword search (`batch_pg.py:293-298`).
    *
    * `caseInsensitive = true` reproduces ILIKE exactly but compiles to
    * `Contains(lower(text), term)`, which parquet cannot push — the
    * scan reads every row group. The default relies on the corpus
    * being case-normalized at write time (graft's silver layer
    * lower-cases nothing but the reference corpus is already clean
    * text), giving a `StringContains` that reaches `PushedFilters`
    * and prunes row groups by min/max stats — the difference between
    * scanning 100 TB and scanning the matching slice. */
  def keywordSearch(documents: DataFrame, term: String,
                    caseInsensitive: Boolean = false): DataFrame =
    documents
      .filter(
        if (caseInsensitive) col("text").ilike("%" + likeEscape(term) + "%")
        else col("text").contains(term))
      .select(col("doc_id"), col("lang"), col("source").as("topic"), col("n_chars"))

  /** Empty hit set with the ranked-search schema — what an analyzed
    * query with no surviving tokens returns. The `lit(false)` filter
    * constant-folds to an empty LocalRelation: no scan runs. */
  private def emptyHits(documents: DataFrame, extra: Seq[Column]): DataFrame =
    documents
      .select(Seq(col("doc_id"), col("lang")) ++ extra :+ lit(0L).as("score"): _*)
      .filter(lit(false))

  /** The scored hit set shared by every ranked variant: score =
    * 3×tf(title) + tf(body) (`es.py:166-240`), zero-score rows
    * dropped, plus any extra pass-through columns (one map-side
    * projection — no re-join to recover them later). With an
    * [[Analyzer]], scoring runs over the normalized text with the
    * analyzed term; an all-stopword query yields the empty hit set. */
  private def scoredHits(documents: DataFrame, term: String,
                         extra: Seq[Column] = Seq.empty,
                         analyzer: Option[Analyzer] = None): DataFrame =
    analyzer.map(_.terms(Seq(term))).getOrElse(Seq(term)) match {
      case Seq(t) =>
        val textCol = analyzer.map(_.normalize(col("text"))).getOrElse(col("text"))
        documents
          .select(Seq(col("doc_id"), col("lang")) ++ extra :+
            (termFrequency(titleZone(textCol), t) * 3 +
              termFrequency(textCol, t)).as("score"): _*)
          .filter(col("score") > 0)
      case _ => emptyHits(documents, extra)
    }

  /** Ranked search (`es.py:166-240`): score desc, top N.
    * TakeOrderedAndProject bounds the sort at N rows per partition —
    * no global sort materializes at scale.
    *
    * `recency` mirrors ES's secondary sort `_score desc, date desc`
    * (`es.py:197-200`): an optional expression over the document row
    * (a publish-date column on a corpus that has one). It sorts
    * BETWEEN score and the doc_id total-order tiebreak and is emitted
    * as a `recency` output column so consumers see what broke the
    * tie. */
  def rankedSearch(documents: DataFrame, term: String, topN: Int = 20,
                   recency: Option[Column] = None,
                   analyzer: Option[Analyzer] = None): DataFrame = {
    val hits = scoredHits(documents, term, recency.map(_.as("recency")).toSeq, analyzer)
    val order =
      if (recency.isDefined) Seq(col("score").desc, col("recency").desc, col("doc_id"))
      else Seq(col("score").desc, col("doc_id"))
    hits.orderBy(order: _*).limit(topN)
  }

  /** Multi-term ranked search with inverse-document-frequency weights —
    * ES `multi_match` takes a QUERY, not a term (`es.py:166-240`), and
    * BM25 weighs each term by its rarity. Single-term [[rankedSearch]]
    * cannot express that (for one term idf is a constant — a monotone
    * transform that never reorders); with several terms the weights
    * decide who wins: a doc matching the rare term outranks one
    * matching the common term the same number of times.
    *
    * score(doc) = Σ_t (3×tf_title(t) + tf_body(t)) × (N / df_t) — a
    * LINEAR idf, not BM25's log: every operation (count ratio,
    * multiply, left-fold add) is IEEE exact-rounded, so any engine
    * reproduces the double bit-for-bit, while `ln` carries no such
    * guarantee across libms. Same term-rarity ordering, deterministic
    * cross-engine.
    *
    * Two scans by nature (corpus statistics, then scoring): the stats
    * aggregate collapses to ONE row broadcast to the scorers — at
    * 100 TB the df pass is a map-side conditional count and the join
    * adds no shuffle. */
  def multiTermSearch(documents: DataFrame, terms: Seq[String], topN: Int = 20,
                      analyzer: Option[Analyzer] = None): DataFrame = {
    require(terms.nonEmpty, "multiTermSearch needs at least one term")
    val analyzed = analyzer.map(_.terms(terms)).getOrElse(terms)
    if (analyzed.isEmpty)
      // every query token was a stopword — ES returns no hits
      return emptyHits(documents, Seq.empty).withColumn("score", col("score").cast("double"))
    val textCol = analyzer.map(_.normalize(col("text"))).getOrElse(col("text"))
    val aggs = count(lit(1)).cast("double").as("n_docs") +:
      analyzed.zipWithIndex.map { case (t, i) =>
        sum(when(textCol.contains(t), 1L).otherwise(0L)).cast("double").as(s"df_$i")
      }
    val stats = documents.agg(aggs.head, aggs.tail: _*)
    val score = analyzed.zipWithIndex.map { case (t, i) =>
      (termFrequency(titleZone(textCol), t) * 3 + termFrequency(textCol, t))
        .cast("double") * (col("n_docs") / greatest(col(s"df_$i"), lit(1.0)))
    }.reduce(_ + _) // left fold: association mirrored in the oracle SQL
    documents.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("lang"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }

  /** BM25-shaped ranked search — the saturation + length
    * normalization ES actually runs (`es.py:166-240` relies on
    * Lucene's BM25 default), which [[multiTermSearch]]'s raw
    * tf×idf lacks: there a doc repeating the term 100× scores 100×,
    * here the 101st mention is nearly free (tf saturates toward
    * k1+1), and long documents stop winning just by having more
    * words (tf is discounted by dl/avgdl). Two deliberate
    * departures from textbook BM25, both for cross-engine
    * determinism: the idf stays LINEAR (N/df — same rarity
    * ordering; `ln` has no bit-identity guarantee across libms,
    * see [[multiTermSearch]]) and every float step (ratio,
    * multiply, divide, left-fold add) is IEEE exact-rounded with
    * the association mirrored in the oracle SQL, so the scores —
    * not just the ranking — replay bit-for-bit.
    *
    * score(doc) = Σ_t idf_t × (tf_t×(k1+1)) / (tf_t + k1×(1−b + b×dl/avgdl))
    * with tf_t = 3×tf_title + tf_body (the title boost folded into
    * the saturating tf, BM25F-style), dl = whitespace token count,
    * avgdl from an exact long sum with ONE final division.
    *
    * Scale shape: identical to [[multiTermSearch]] — corpus
    * statistics (n_docs, avgdl, df_t) collapse to ONE row broadcast
    * into the scoring scan, the top-N rides TakeOrderedAndProject;
    * no shuffle ever touches the corpus. */
  def bm25Search(documents: DataFrame, terms: Seq[String], topN: Int = 20,
                 k1: Double = 1.2, b: Double = 0.75,
                 analyzer: Option[Analyzer] = None): DataFrame = {
    require(terms.nonEmpty, "bm25Search needs at least one term")
    val analyzed = analyzer.map(_.terms(terms)).getOrElse(terms)
    if (analyzed.isEmpty)
      return emptyHits(documents, Seq.empty).withColumn("score", col("score").cast("double"))
    val textCol = analyzer.map(_.normalize(col("text"))).getOrElse(col("text"))
    val dl = size(split(textCol, " ")).cast("long")
    val aggs = count(lit(1)).cast("double").as("n_docs") +:
      (sum(dl).cast("double") / count(lit(1))).as("avgdl") +:
      analyzed.zipWithIndex.map { case (t, i) =>
        sum(when(textCol.contains(t), 1L).otherwise(0L)).cast("double").as(s"df_$i")
      }
    val stats = documents.agg(aggs.head, aggs.tail: _*)
    // k1+1 and 1-b are COMPUTED (lit(k1)+lit(1)), not pre-folded in
    // Scala: the oracle writes (1.2 + 1) so both engines derive the
    // same double the same way
    val norm = lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (dl.cast("double") / col("avgdl")))
    val score = analyzed.zipWithIndex.map { case (t, i) =>
      val tf = (termFrequency(titleZone(textCol), t) * 3 + termFrequency(textCol, t))
        .cast("double")
      (col("n_docs") / greatest(col(s"df_$i"), lit(1.0))) * (tf * (lit(k1) + lit(1.0))) /
        (tf + norm)
    }.reduce(_ + _) // left fold: association mirrored in the oracle SQL
    documents.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("lang"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }

  /** Keyset cursor for the next page: the LAST row of the given page
    * under the ranked order (score desc, doc_id asc) — i.e. the
    * minimum by that order. One row; callers broadcast it. */
  def pageCursor(page: DataFrame): DataFrame =
    page.orderBy(col("score").asc, col("doc_id").desc).limit(1)
      .select(col("score").as("cursor_score"), col("doc_id").as("cursor_doc"))

  /** Page N+1 of [[rankedSearch]] by KEYSET pagination — the reference
    * paginates with LIMIT/OFFSET (`services/batch_pg.py:303-311`),
    * which at scale re-scores and re-sorts every preceding page just
    * to throw it away (OFFSET 10 000 000 walks ten million rows). The
    * scale-correct form seeks instead: everything STRICTLY AFTER the
    * previous page's last row in (score desc, doc_id asc) order —
    * `score < cursor OR (score = cursor AND doc_id > cursor_doc)`.
    * The one-row cursor rides a broadcast nested-loop join (a 1×N
    * predicate pushover, not a real cross product) and the result is
    * again TakeOrderedAndProject-bounded: page depth never changes the
    * cost of a page. */
  def rankedSearchAfter(documents: DataFrame, term: String, cursor: DataFrame,
                        topN: Int = 20,
                        analyzer: Option[Analyzer] = None): DataFrame =
    // the analyzer MUST match the one page 1 was scored with — keyset
    // cursors compare scores, and scores from two different scoring
    // functions would silently skip or duplicate hits across pages
    scoredHits(documents, term, analyzer = analyzer)
      .crossJoin(broadcast(cursor))
      .filter(col("score") < col("cursor_score") ||
        (col("score") === col("cursor_score") && col("doc_id") > col("cursor_doc")))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
      .drop("cursor_score", "cursor_doc")

  /** ES `"fuzziness": "AUTO"` edit budget (`es.py:181`): terms under 3
    * chars match exactly, 3-5 chars allow one edit, longer allow two. */
  def autoFuzziness(term: String): Int =
    if (term.length < 3) 0 else if (term.length <= 5) 1 else 2

  /** Fuzzy term frequency: whitespace tokens within `maxEdits`
    * Levenshtein edits of the term, counted map-side with an array
    * filter over the split — deterministic, unlike ES's BM25+fuzzy
    * scoring. The thresholded `levenshtein` abandons a token as soon
    * as its running distance exceeds the budget, so the per-token cost
    * is O(|token| × maxEdits), not O(|token| × |term|).
    *
    * Measured and rejected: a fused native expression (one loop over
    * `UTF8String.split` + thresholded `levenshteinDistance`) was
    * indistinguishable at sf0.1 (0.40-0.53 s vs 0.37-0.52 s) — the
    * per-token DP dominates and both paths share it, so the HOF
    * stays for its transparency. */
  def fuzzyTermFrequency(text: Column, term: String, maxEdits: Int): Column =
    size(filter(split(text, " "), w =>
      if (maxEdits == 0) w === lit(term)
      else levenshtein(w, lit(term), maxEdits) >= 0)).cast("long")

  /** Fuzzy ranked search (`es.py:166-240` with fuzziness AUTO): a
    * typo'd query still ranks hits. Score = 3×fuzzy-tf(title zone) +
    * fuzzy-tf(body), descending — the same TakeOrderedAndProject
    * shape as [[rankedSearch]], so only the top N survive per
    * partition and no global sort materializes. */
  def fuzzySearch(documents: DataFrame, term: String, topN: Int = 20,
                  analyzer: Option[Analyzer] = None): DataFrame =
    analyzer.map(_.terms(Seq(term))).getOrElse(Seq(term)) match {
      case Seq(t) =>
        val maxEdits = autoFuzziness(t)
        val textCol = analyzer.map(_.normalize(col("text"))).getOrElse(col("text"))
        documents
          .select(
            col("doc_id"),
            col("lang"),
            (fuzzyTermFrequency(titleZone(textCol), t, maxEdits) * 3 +
              fuzzyTermFrequency(textCol, t, maxEdits)).as("score"))
          .filter(col("score") > 0)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(topN)
      case _ => emptyHits(documents, Seq.empty)
    }

  /** Search highlighting (`es.py:188-229`): the reference returns up
    * to 150-char highlight fragments per hit; we extract ONE
    * deterministic fragment — `context` chars either side of the FIRST
    * occurrence. Positional (instr + substr), not regex: greedy-match
    * semantics differ between regex engines, byte positions do not, so
    * any oracle agrees bytewise. The contains() pre-filter reaches the
    * scan as a pushed StringContains. */
  def searchHighlight(documents: DataFrame, term: String, context: Int = 60,
                      analyzer: Option[Analyzer] = None): DataFrame =
    analyzer.map(_.terms(Seq(term))).getOrElse(Seq(term)) match {
      case Seq(t) =>
        // With an analyzer, the MATCH runs over the normalized text but
        // the fragment is sliced from the ORIGINAL — ES highlights the
        // stored field, not the analyzed token stream. Positions from
        // lower() transfer exactly because ASCII case mapping preserves
        // byte length (the one Unicode exception class — locale-special
        // mappings like İ — is outside this corpus's contract).
        val hay = analyzer.map(_.normalize(col("text"))).getOrElse(col("text"))
        val pos = instr(hay, t)
        val start = greatest(lit(1), pos - context)
        documents
          .filter(hay.contains(t))
          .select(col("doc_id"), col("source").as("topic"),
            col("text").substr(start, pos - start + lit(t.length + context)).as("snippet"))
      case _ =>
        documents.select(col("doc_id"), col("source").as("topic"),
          lit("").as("snippet")).filter(lit(false))
    }

  /** Multi-fragment highlighting — the full ES highlight contract
    * (`es.py:188-229`): up to `numFragments` fragments, each `context`
    * chars either side of successive occurrences of the term. Like
    * [[searchHighlight]] the arithmetic is positional (instr/substr
    * byte offsets, which every engine agrees on) — occurrence i+1 is
    * found by searching the remainder AFTER occurrence i's term, so
    * fragments never re-highlight the same match. Fewer occurrences
    * than `numFragments` yield a shorter array (ES drops empty
    * fragments too). No merging of overlapping fragments — successive
    * occurrences closer than a fragment width repeat the shared text,
    * a documented simplification of ES's fragment merging.
    *
    * All `numFragments` offsets come from ONE projection over the row
    * (chained byte searches, no explode, no regex) — per-row cost is
    * O(numFragments × |text|) worst case and the operator stays a
    * zero-shuffle codegen'd map. */
  def searchHighlightMulti(documents: DataFrame, term: String, context: Int = 60,
                           numFragments: Int = 3): DataFrame = {
    require(numFragments >= 1 && context >= 0)
    val len = term.length
    // successive absolute 1-based positions; 0 = no further occurrence
    val positions = Iterator.iterate(instr(col("text"), term)) { prev =>
      // search the remainder after the previous match's term; r is
      // relative (1-based) inside that remainder, 0 when absent
      val r = instr(substring_index_safe(col("text"), prev + len), term)
      when(prev > 0 && r > 0, prev + len + r - 1).otherwise(lit(0))
    }.take(numFragments).toSeq
    val frags = positions.map { p =>
      val start = greatest(lit(1), p - context)
      when(p > 0, col("text").substr(start, p - start + lit(len + context)))
    }
    // One row per fragment, scalar columns only. The round-7 form
    // returned `fragments array<string>` and the driver's correctness
    // gate crashed sorting it (pandas lexsort can't hash ndarray
    // cells) — registry outputs must stay flat. posexplode keeps the
    // operator a zero-shuffle map: Generate over the same codegen'd
    // positional projection, no aggregation, no exchange.
    documents
      .filter(col("text").contains(term))
      .select(col("doc_id"), col("source").as("topic"),
        posexplode(filter(array(frags: _*), f => f.isNotNull)))
      .withColumnRenamed("pos", "frag_idx")
      .withColumnRenamed("col", "fragment")
  }

  /** `substr(text, pos)` with a Column position (the 2-arg form Spark
    * only exposes with literal positions): everything from `pos` to
    * the end. */
  private def substring_index_safe(text: Column, pos: Column): Column =
    text.substr(pos, length(text))

  /** Search with topic/lang/size filters (`es.py:204-215`): the
    * structured predicates sit in front of the text match so they reach
    * the scan as pushed filters. */
  def searchFiltered(documents: DataFrame, term: String, lang: String,
                     minChars: Long, maxChars: Long): DataFrame =
    documents
      .filter(col("lang") === lang &&
        col("n_chars") >= minChars && col("n_chars") <= maxChars &&
        col("text").contains(term))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        termFrequency(col("text"), term).as("matches"))
}
