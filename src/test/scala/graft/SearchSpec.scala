package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

/** Fuzzy search + highlighting (reference `es.py:166-240`): the exact
  * keyword/ranked paths are oracle-checked end-to-end; these pin the
  * edit-budget and fragment-boundary semantics on crafted rows. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("analyzer: case-insensitive scoring, stopword query matches nothing") {
    val a = Search.Analyzer.english
    val corpus = docs((1L, "The Window is OPEN"), (2L, "no match here"))
    // mixed-case term + mixed-case text both normalize
    val hits = Search.rankedSearch(corpus, "WINDOW", analyzer = Some(a))
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(hits === Map(1L -> 4L)) // title zone 3x + body 1x
    // without the analyzer the same query finds nothing (case-sensitive)
    assert(Search.rankedSearch(corpus, "WINDOW").count() === 0L)
    // an all-stopword query is analyzed to nothing -> empty, not error
    assert(Search.rankedSearch(corpus, "The", analyzer = Some(a)).count() === 0L)
    assert(Search.fuzzySearch(corpus, "the", analyzer = Some(a)).count() === 0L)
    assert(Search.multiTermSearch(corpus, Seq("The", "IS"), analyzer = Some(a)).count() === 0L)
  }

  test("analyzer: multiTermSearch drops stopword terms, keeps the rest") {
    val a = Search.Analyzer.english
    val corpus = docs((1L, "Window merge path"), (2L, "the the the"))
    val analyzed = Search.multiTermSearch(corpus, Seq("Window", "the", "merge"),
      analyzer = Some(a)).select("doc_id").as[Long].collect().toSet
    assert(analyzed === Set(1L)) // doc 2 matches only the dropped stopword
  }

  test("analyzer: column token stream agrees with the query-side terms rule") {
    // The spec pinning VERDICT r8 item 8: corpus stats and search share
    // ONE tokenization. tokens(text) must equal terms(raw split) for
    // any whitespace-tokenized string.
    val a = Search.Analyzer.english
    val samples = Seq("The Window AND the merge", "is", "", "plain words only")
    val fromCol = samples.toDF("text")
      .select(a.tokens(col("text")).as("t")).as[Seq[String]].collect()
    val fromTerms = samples.map(s => a.terms(s.split(" ", -1).toSeq))
    assert(fromCol.toSeq === fromTerms)
  }

  test("analyzed highlight matches case-insensitively, snippets come from the raw text") {
    val a = Search.Analyzer.english
    val corpus = docs((1L, "prefix words here WINDOW more tail"), (2L, "no hit"))
    val out = Search.searchHighlight(corpus, "Window", context = 6, analyzer = Some(a))
      .select("doc_id", "snippet").as[(Long, String)].collect().toMap
    // fragment preserves the ORIGINAL casing around the matched zone
    assert(out === Map(1L -> " here WINDOW more "))
    // all-stopword query: empty result, not an error
    assert(Search.searchHighlight(corpus, "the", analyzer = Some(a)).count() === 0L)
    // without the analyzer the mixed-case query misses
    assert(Search.searchHighlight(corpus, "Window").count() === 0L)
  }

  test("analyzed bigrams form across removed stopwords") {
    val a = Search.Analyzer.english
    val out = graft.operators.Corpus.bigramCounts(
      docs((1L, "jump over the fence")), topN = 10, analyzer = Some(a))
      .as[(String, Long)].collect().toMap
    // "the" removed -> stream [jump, over, fence]: the pair bridges the gap
    assert(out === Map("jump over" -> 1L, "over fence" -> 1L))
  }

  test("phrase matching: contiguous word-bounded sequence only (match_phrase semantics)") {
    val corpus = docs(
      (1L, "open the window now"),       // exact phrase
      (2L, "the window"),                 // exact phrase, whole text
      (3L, "window the open"),            // reordered -> no match
      (4L, "breathe windows open"),       // substring token -> no match
      (5L, "the windowsill is white"))    // boundary: 'window' prefix of longer token
    val hits = Search.rankedSearch(corpus, "the window")
      .select("doc_id").as[Long].collect().toSet
    assert(hits === Set(1L, 2L))
  }

  test("autoFuzziness follows the ES AUTO ladder") {
    assert(Search.autoFuzziness("ab") === 0)
    assert(Search.autoFuzziness("abc") === 1)
    assert(Search.autoFuzziness("abcde") === 1)
    assert(Search.autoFuzziness("abcdef") === 2)
  }

  test("fuzzySearch ranks typo'd-term hits; unrelated text scores zero") {
    // "windo" (5 chars -> 1 edit) matches "window" (insert) and "wind"
    // (delete) but not "winter" (distance 3)
    val out = Search.fuzzySearch(
      docs((1L, "the window is open"), (2L, "wind from the north"),
        (3L, "winter is coming"), (4L, "")),
      "windo")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(out.keySet === Set(1L, 2L))
    // both hits sit in the 80-char title zone: score = 3*1 + 1
    assert(out(1L) === 4L)
  }

  test("fuzzySearch body-only hits score without the title boost") {
    val pad = ("x " * 50).trim // pushes the term past the 80-char title zone
    val out = Search.fuzzySearch(docs((1L, s"$pad window")), "windo")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(out(1L) === 1L)
  }

  test("fuzzySearch with a short term falls back to exact matching") {
    val out = Search.fuzzySearch(docs((1L, "ab here"), (2L, "ax here")), "ab")
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L)) // maxEdits=0: "ax" does not match
  }

  test("fuzzy recall dominates exact recall on the real corpus (typo'd term)") {
    // every doc the exact ranked search finds for "window" must score
    // > 0 under fuzzySearch("windo"): the exact token is within the
    // 1-edit budget, so fuzzy hits are a superset before top-N. (Holds
    // on whitespace-tokenized corpora like the test tables; a
    // punctuation-glued occurrence — "window," — would satisfy the
    // exact \b match but exceed the token edit budget.)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Search.rankedSearch(docs, "window", topN = 1000000)
      .select("doc_id").as[Long].collect().toSet
    val fuzzy = Search.fuzzySearch(docs, "windo", topN = 1000000)
      .select("doc_id").as[Long].collect().toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(fuzzy))
  }

  test("dateHistogram rejects an unsupported interval at construction") {
    val e = intercept[IllegalArgumentException] {
      graft.operators.Analytics.dateHistogram(
        Tables.events(spark, "/root/testdata/sf0.001"), "fortnight")
    }
    assert(e.getMessage.contains("interval"))
  }

  test("multiTermSearch: the rare term outranks the common term at equal tf") {
    // "common" appears in 4 docs (df=4), "rare" in 1 (df=4x weight):
    // doc 10 matches only rare, docs 1-3 only common — same tf, but
    // idf must put doc 10 first
    val d = docs(
      (1L, "common talk"), (2L, "common talk"), (3L, "common talk"),
      (4L, "common and rare together"), (10L, "rare only"))
    val out = Search.multiTermSearch(d, Seq("common", "rare"))
      .select("doc_id", "score").as[(Long, Double)].collect()
    // doc 4 matches both -> highest; then the rare-only doc; commons last
    assert(out.map(_._1).toSeq === Seq(4L, 10L, 1L, 2L, 3L))
    val score = out.toMap
    assert(score(10L) > score(1L)) // idf is load-bearing
    // single term: idf is a constant factor -> same ORDER as rankedSearch
    val one = Search.multiTermSearch(d, Seq("common")).select("doc_id")
      .as[Long].collect().toSeq
    val plain = Search.rankedSearch(d, "common").select("doc_id")
      .as[Long].collect().toSeq
    assert(one === plain)
  }

  test("bm25Search: tf saturates and length normalization demotes the long document") {
    // linear tf×idf would rank doc 2 (term ×20) 20× above doc 1
    // (term ×1); BM25's saturation caps the gap near k1+1 = 2.2×
    val spam = ("term " * 20).trim
    val d1 = docs((1L, "term plus seven more filler words here"),
      (2L, spam + " " + ("filler " * 13).trim))
    val out1 = Search.bm25Search(d1, Seq("term"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(out1(2L) > out1(1L)) // more mentions still rank higher...
    assert(out1(2L) / out1(1L) < 2.5, // ...but nowhere near 20x
      s"saturation must cap the spam gap: ${out1(2L) / out1(1L)}")
    // equal tf, different length: the shorter document wins (its
    // mention is a larger fraction of the text)
    val d2 = docs((1L, "term four words total here"),
      (2L, "term " + ("filler " * 40).trim))
    val out2 = Search.bm25Search(d2, Seq("term"))
      .select("doc_id", "score").as[(Long, Double)].collect()
    assert(out2.map(_._1).toSeq === Seq(1L, 2L),
      "equal-tf shorter doc must outrank the longer one")
    // idf still orders terms by rarity, like multiTermSearch
    val d3 = docs(
      (1L, "common talk"), (2L, "common talk"), (3L, "common talk"),
      (10L, "rare only"))
    val out3 = Search.bm25Search(d3, Seq("common", "rare"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(out3(10L) > out3(1L), "rarity weighting is load-bearing")
  }

  test("recency tiebreak reorders score ties and is load-bearing") {
    // three docs, identical score ("term" once in the title zone):
    // default order is doc_id asc; recency desc must reverse it
    val d = docs((1L, "term alpha"), (2L, "term bravo"), (3L, "term charlie"))
    val default = Search.rankedSearch(d, "term")
      .select("doc_id").as[Long].collect().toSeq
    assert(default === Seq(1L, 2L, 3L))
    val byRecency = Search.rankedSearch(d, "term",
      recency = Some(col("doc_id") * 10)) // newer = higher doc_id here
      .select("doc_id").as[Long].collect().toSeq
    assert(byRecency === Seq(3L, 2L, 1L))
    // recency sorts BETWEEN score and doc_id: a higher score still wins
    val mixed = docs((1L, "term term alpha"), (2L, "term bravo"))
    val out = Search.rankedSearch(mixed, "term", recency = Some(-col("doc_id")))
      .select("doc_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 2L)) // doc 1 scores 6 > 3 despite older recency
  }

  test("keyset pagination: pages are disjoint, contiguous, and union to the top-2N") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val page1 = Search.rankedSearch(docs, "window", topN = 10)
      .select("doc_id", "score").as[(Long, Long)].collect().toSeq
    val page2 = Search.rankedSearchAfter(docs, "window",
      Search.pageCursor(Search.rankedSearch(docs, "window", topN = 10)), topN = 10)
      .select("doc_id", "score").as[(Long, Long)].collect().toSeq
    val top20 = Search.rankedSearch(docs, "window", topN = 20)
      .select("doc_id", "score").as[(Long, Long)].collect().toSeq
    assert(page1.size === 10 && page2.size === 10)
    assert(page1 ++ page2 === top20) // same order, no gap, no overlap
  }

  test("searchHighlightMulti returns successive non-null fragments, bounded by count") {
    val spread = "window " + ("a" * 70) + " window " + ("b" * 70) +
      " window " + ("c" * 70) + " window end" // 4 occurrences, 3 fragments max
    val out = Search.searchHighlightMulti(
      docs((1L, "one window only"), (2L, spread), (3L, "none here")),
      "window", context = 10, numFragments = 3)
      .select("doc_id", "frag_idx", "fragment").as[(Long, Int, String)]
      .collect().toSeq.sorted
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === Seq("one window only")) // single occurrence -> 1 fragment
    val frags = out(2L)
    assert(frags.size === 3) // capped at numFragments despite 4 occurrences
    // fragment i centers occurrence i: 10 context chars each side
    // (space included), clamped at the text start for occurrence 1
    assert(frags(0) === "window " + "a" * 9)
    assert(frags(1) === "a" * 9 + " window " + "b" * 9)
    assert(frags(2) === "b" * 9 + " window " + "c" * 9)
  }

  test("searchHighlight clamps the fragment at both text boundaries") {
    val long = ("a" * 100) + " window " + ("b" * 100)
    val out = Search.searchHighlight(
      docs((1L, "window at the start"), (2L, long), (3L, "no match here")),
      "window")
      .select("doc_id", "snippet").as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === "window at the start") // start clamp + short tail
    // interior hit: exactly 60 chars context before, 60 after
    assert(out(2L) === ("a" * 59) + " window " + ("b" * 59))
    assert(out(2L).length === 60 + "window".length + 60)
  }
}
