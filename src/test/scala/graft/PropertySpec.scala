package graft

import graft.operators.{Cleaning, TextOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants over generated inputs. Each property
  * evaluates ONE Spark job over the whole generated batch (a job per
  * sample would take minutes for no extra coverage). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // strings biased towards the cleaner's trigger tokens and messy whitespace
  private val messyText: Gen[String] = {
    val token = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("ADVERTISEMENT", "SCROLL TO CONTINUE WITH CONTENT", "Pilihan Redaksi",
        "Lihat Juga :", "(ANTARA FOTO/x)", "(CNN Indonesia/y)", "[Gambas:Video]",
        "Jakarta, CNN Indonesia --", "\n\n\n", "\t", "  "))
    Gen.listOf(token).map(_.mkString(" ")).map(_.take(500))
  }

  // NOT a property: idempotency. The cleaner is a single fixed pass
  // (like the reference's cleaner.py) — stripping a dateline can expose
  // a second dateline behind it, which only the next pass would strip.
  test("property: cleanContent is a no-op on trigger-free normalized text") {
    GraftExtensions.register(spark)
    val plain = Gen.nonEmptyListOf(
      Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8)))
      .map(_.mkString(" ").take(400).trim)
    val texts = samples(plain, 300)
    val df = texts.toDF("t")
      .select(col("t"), Cleaning.cleanContent(col("t")).as("c"))
    assert(df.filter(col("t") =!= col("c")).count() === 0L)
  }

  test("property: cleaned content never has leading/trailing or doubled spaces") {
    GraftExtensions.register(spark)
    val texts = samples(messyText, 300)
    val bad = texts.toDF("t")
      .select(Cleaning.cleanContent(col("t")).as("c"))
      .filter(col("c").rlike("^\\s|\\s$|\\s\\s"))
    assert(bad.count() === 0L)
  }

  test("property: incremental minhash == full recompute under ANY corpus/delta split") {
    // generalizes the fixed even/odd DedupSpec case: for several
    // md5-derived corpus/delta partitions of the real sf0.001 corpus,
    // (pairs within corpus) ∪ (incremental probe of delta) must equal
    // the full recompute — no pair lost or duplicated across the
    // boundary, wherever the boundary falls
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
    val full = graft.operators.Dedup.minhashPairs(all)
      .as[(Long, Long, Double)].collect().toSet
    Seq("4", "8", "c").foreach { boundary => // ~25/50/75% splits
      val inCorpus = substring(md5(col("doc_id").cast("string")), 1, 1) < boundary
      val corpus = all.filter(inCorpus)
      val delta = all.filter(!inCorpus)
      val got = graft.operators.Dedup.minhashPairs(corpus)
        .as[(Long, Long, Double)].collect().toSet ++
        graft.operators.Dedup.incrementalMinhashCandidates(
          delta, graft.operators.Dedup.bandPostings(corpus))
          .as[(Long, Long, Double)].collect().toSet
      assert(got === full, s"split at md5 prefix $boundary diverged")
    }
  }

  test("property: native clean_content equals the regexp_replace Column chain") {
    GraftExtensions.register(spark)
    val texts = samples(messyText, 300)
    val df = texts.toDF("t").select(
      Cleaning.cleanContent(col("t")).as("native"),
      Cleaning.cleanContentColumns(col("t")).as("chain"))
    assert(df.filter(col("native") =!= col("chain")).count() === 0L)
  }

  test("property: searchHighlightMulti equals a straightforward Scala reference") {
    // reference implementation: scan occurrences left to right, each
    // search resuming after the previous match's term; take the first
    // `n` fragments of `ctx` chars context each side (1-based clamps)
    def ref(text: String, term: String, ctx: Int, n: Int): Seq[String] = {
      Iterator.iterate(text.indexOf(term)) { p =>
        val next = text.indexOf(term, p + term.length)
        next
      }.takeWhile(_ >= 0).take(n).map { p0 =>
        val p = p0 + 1 // 1-based
        val start = math.max(1, p - ctx)
        val len = p - start + term.length + ctx
        text.slice(start - 1, start - 1 + len)
      }.toSeq
    }
    val term = "xy"
    // texts over a tiny alphabet so the term appears 0..many times,
    // adjacent, overlapping-context and boundary-clamped
    val gen = Gen.listOf(Gen.oneOf("x", "y", "a", " ")).map(_.mkString.take(60))
    val texts = samples(gen, 400).filter(_.contains(term))
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = graft.operators.Search
      .searchHighlightMulti(got, term, context = 5, numFragments = 3)
      .select("doc_id", "frag_idx", "fragment").as[(Long, Int, String)]
      .collect().toSeq.sorted
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(out.getOrElse(i.toLong, Seq.empty) === ref(t, term, 5, 3), s"text=<$t>")
    }
  }

  test("property: exactPercentiles equals the sorted-multiset reference on random data") {
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, 50L))
    samples(gen, 25).foreach { values =>
      val df = values.zipWithIndex
        .map { case (v, i) => (i.toLong, "x", "en", "s", v) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val qs = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L), ("p95", 19L, 20L))
      val got = graft.operators.Corpus.exactPercentiles(df, col("n_chars"), qs)
        .select("p25", "p50", "p75", "p95")
        .as[(Long, Long, Long, Long)].collect().head
      val sorted = values.sorted
      def ref(num: Long, den: Long) = // smallest value with cum >= ceil(q*N)
        sorted((((sorted.size * num) + den - 1) / den - 1).toInt.max(0))
      assert(got === ((ref(1, 4), ref(1, 2), ref(3, 4), ref(19, 20))),
        s"values=$values")
    }
  }

  test("property: hashSplit is exhaustive, disjoint and stable under corpus growth") {
    val ids = samples(Gen.choose(1L, 1000000L), 500).distinct
    val base = ids.toDF("doc_id")
    val split = TextOps.hashSplit(base, col("doc_id"), testBuckets = 410)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split.keySet === ids.toSet) // every doc assigned exactly once
    assert(split.values.toSet.subsetOf(Set("train", "test")))
    // growth stability: adding rows must not move any existing doc
    val grown = TextOps.hashSplit(
      (ids ++ Seq(2000001L, 2000002L)).toDF("doc_id"), col("doc_id"), testBuckets = 410)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    ids.foreach(id => assert(grown(id) === split(id)))
    // 410/4096 ≈ 10%: loose band, this is a determinism check not a
    // statistical one
    val testFrac = split.values.count(_ == "test").toDouble / ids.size
    assert(testFrac > 0.02 && testFrac < 0.25, s"test fraction $testFrac")
    // boundary semantics: 0 buckets -> all train; 4096 is rejected
    // (4-hex-char threshold would break the fixed-width compare)
    assert(TextOps.hashSplit(base, col("doc_id"), 0)
      .filter(col("split") === "test").count() === 0L)
    intercept[IllegalArgumentException] {
      TextOps.hashSplit(base, col("doc_id"), 4096)
    }
  }

  test("property: dedupKeepFirst emits one row per distinct key, all from the input") {
    val rows = samples(Gen.zip(Gen.choose(1L, 50L), Gen.choose(1, 5)), 400)
    val df = rows.toDF("id", "k")
    val out = Cleaning.dedupKeepFirst(df, col("k"), col("id"))
    assert(out.count() === df.select("k").distinct().count())
    assert(out.except(df).count() === 0L) // every survivor is an input row
  }

  test("property: native graft_shingles matches the HOF formulation as a set") {
    GraftExtensions.register(spark)
    // include empty tokens (double spaces) and docs shorter than k
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaLowerStr.map(_.take(4)), Gen.const("")))
      .map(_.mkString(" ").take(200))
    val texts = samples(gen, 300)
    val df = texts.toDF("t").select(
      org.apache.spark.sql.functions.array_sort(
        org.apache.spark.sql.functions.call_function("graft_shingles",
          org.apache.spark.sql.functions.col("t"),
          org.apache.spark.sql.functions.lit(3))).as("native"),
      org.apache.spark.sql.functions.array_sort(
        graft.operators.Dedup.shinglesHof(org.apache.spark.sql.functions.col("t"), 3)).as("hof"))
    assert(df.filter(org.apache.spark.sql.functions.col("native") =!=
      org.apache.spark.sql.functions.col("hof")).count() === 0L)
  }

  test("property: scalar minhash/simhash sigs equal the aggregate-over-explode form") {
    GraftExtensions.register(spark)
    // random docs incl. short (< k tokens, dropped by both paths via
    // their respective filters) and repeated-token texts
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaLowerStr.map(_.take(3)), Gen.const("tok")))
      .map(_.mkString(" ").take(200))
    val texts = samples(gen, 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
    val docs = texts.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tok = graft.operators.Dedup.shingleRows(docs)
    val aggSigs = tok.groupBy(col("doc_id")).agg(
      call_function("graft_minhash", xxhash64(col("shingle")), lit(64)).as("sig"),
      call_function("graft_simhash", xxhash64(col("shingle"))).as("simhash"))
    // xxhash64-family scalar twin (the registered path moved to the
    // md5-KM family, pinned against its own reference in DedupSpec)
    val scalarSigs = docs.filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        call_function("graft_minhash_sig",
          call_function("graft_shingles", col("text"), lit(3)), lit(64)).as("sig"),
        call_function("graft_simhash_sig",
          call_function("graft_shingles", col("text"), lit(3))).as("simhash"))
    assert(scalarSigs.count() === aggSigs.count()) // same doc set survives
    assert(scalarSigs.except(aggSigs).count() === 0L)
    assert(aggSigs.except(scalarSigs).count() === 0L)
  }

  test("property: PII redaction leaves no live URL/email and never corrupts protected forms") {
    // adversarial mixes of the three PII shapes plus the forms the
    // phone heuristic explicitly protects (TextOps.PiiSteps ordering
    // and >=9-digit rule)
    val piiText: Gen[String] = {
      val token = Gen.oneOf(
        Gen.alphaLowerStr.map(_.take(6)),
        Gen.const("https://ex.com/a@b.com/x?q=1"), // email INSIDE a url
        Gen.const("user.name+tag@mail-host.co.id"),
        Gen.const("0812-3456-7890"),
        Gen.const("+62(21)4567-89012"),
        Gen.const("2024-01-02 03:04"), // ISO date+time: 8 digits, protected
        Gen.const("call 555-0199 now")) // 7 digits: below threshold
      Gen.listOf(token).map(_.mkString(" ")).map(_.take(400))
    }
    val texts = samples(piiText, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
    val docs = texts.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.redactPii(docs).join(docs, "doc_id")
    // nothing URL- or email-shaped survives redaction (a BARE dangling
    // "https://" scheme — the generator's truncation can cut a URL to
    // exactly that — carries no content and is rightly left alone)
    assert(out.filter(col("redacted").rlike("https?://[^ ]")).count() === 0L)
    assert(out.filter(col("redacted")
      .rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).count() === 0L)
    // an email inside a URL vanishes WITH the url — never a dangling
    // <EMAIL> glued to the <URL> placeholder
    assert(out.filter(col("redacted").contains("<URL><EMAIL>")).count() === 0L)
    // protected forms pass through verbatim
    for (kept <- Seq("2024-01-02 03:04", "call 555-0199 now"))
      assert(out.filter(col("text").contains(kept) && !col("redacted").contains(kept))
        .count() === 0L, s"protected form corrupted: $kept")
    // phone-shaped runs are gone
    assert(out.filter(col("redacted").contains("0812-3456-7890")).count() === 0L)
  }

  test("property: cdcChunks reassembles ANY whitespace-tokenized text; cuts are local") {
    import graft.operators.Dedup
    val words = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(6)))
      .map(_.mkString(" ").take(400))
    val texts = samples(words, 200).distinct
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // invariant 1: chunks partition the token stream — concatenating
    // them in chunk order reproduces the document exactly
    val back = Dedup.cdcChunks(docs)
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        x => x.getField("chunk_text"))).as("rebuilt"))
    val orig = docs.select(col("doc_id"), col("text"))
    assert(back.join(orig, "doc_id").filter(col("rebuilt") =!= col("text")).count() === 0L)
    // invariant 2: cut decisions are per-token, so a doc and its copy
    // behind ANY prefix share every chunk whose tokens sit strictly
    // after the prefix's last boundary — verified as: the suffixed
    // corpus finds every original doc as a substring-dup of its
    // prefixed twin (docs long enough to clear the threshold)
    val long = texts.zipWithIndex.filter(_._1.split(" ").length >= 60).take(20)
    if (long.nonEmpty) {
      val paired = (long.map { case (t, i) => (i.toLong, t) } ++
        long.map { case (t, i) => (10000L + i, s"zz$i yy$i xx$i $t") })
        .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val pairs = Dedup.substringDupPairs(paired, minSharedTokens = 8L)
        .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
      long.foreach { case (_, i) =>
        assert(pairs.contains((i.toLong, 10000L + i)),
          s"doc $i must match its prefixed twin through CDC chunks")
      }
    }
  }

  test("property: quality_score is always in [0, 1] and bands are consistent") {
    val texts = samples(Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(6)))
      .map(_.mkString(" ").take(400)), 300)
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val bad = TextOps.qualityScore(docs).filter(
      col("quality_score") < 0 || col("quality_score") > 1 ||
        (col("quality_band") === "high" && col("quality_score") < 0.6) ||
        (col("quality_band") === "low" && col("quality_score") >= 0.4))
    assert(bad.count() === 0L)
  }

  test("property: packed charlm trigram order == UTF8 byte order; counts == the explode form") {
    // the packed-code-point fold order (graft.functions.CharlmModel)
    // is bit-exact only if unsigned packed-long order equals
    // UTF8String byte order for ANY trigram pair — the UTF-8
    // order-preserving/prefix-free argument, checked here over a
    // deliberately nasty alphabet: ASCII, boundary code points around
    // every UTF-8 length transition (0x7F/0x80, 0x7FF/0x800,
    // 0xFFFF/0x10000), CJK, emoji, and NUL
    val nastyChar: Gen[Int] = Gen.oneOf(
      Gen.choose(0x00, 0x7F), Gen.oneOf(0x7F, 0x80, 0x81, 0x7FF, 0x800, 0x801),
      Gen.choose(0x4E00, 0x9FFF), Gen.oneOf(0xFFFF, 0x10000, 0x1F680, 0x10FFFF),
      Gen.choose(0x80, 0x7FF))
      .suchThat(cp => cp < 0xD800 || cp > 0xDFFF) // no lone surrogates
    val tri: Gen[String] = Gen.listOfN(3, nastyChar)
      .map(cps => new String(cps.toArray, 0, 3))
    val tris = samples(tri, 400)
    def packed(s: String): Long = {
      val cps = graft.functions.CharlmModel.codePoints(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (cps(0).toLong << 42) | (cps(1).toLong << 21) | cps(2).toLong
    }
    tris.combinations(2).take(20000).foreach { case Seq(a, b) =>
      val byteOrd = Integer.signum(org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)))
      val packOrd = java.lang.Long.compare(packed(a), packed(b)).sign
      assert(byteOrd === packOrd, s"order mismatch for ${a.codePoints().toArray.toSeq} vs ${b.codePoints().toArray.toSeq}")
      // unpack must invert pack (valid UTF-8 roundtrip)
      assert(graft.functions.CharlmModel.unpack(packed(a)).toString === a)
    }
    // the native training aggregate == the explode form, one Spark job
    GraftExtensions.register(spark)
    val docs = samples(Gen.listOfN(8, tri).map(_.mkString), 100)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = TextOps.charlmCounts(docs)
      .as[(String, Long)].collect().toMap
    val explodeForm = docs.filter(length(col("text")) >= 3)
      .select(explode(call_function("graft_char_ngrams", col("text"), lit(3))).as("tri"))
      .groupBy(col("tri")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(native === explodeForm)
  }
}
