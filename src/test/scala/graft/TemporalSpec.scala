package graft

import graft.operators.{Analytics, Corpus, Temporal}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit semantics for the round-8 event-time + curation operators.
  * The as-of join is additionally cross-validated against the naive
  * join+argmax formulation on real data — the two must be row-identical
  * (the union+window form exists for scale, not different answers). */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  test("asofJoin: inclusive match, latest-prior pick, null when no prior right") {
    val left = Seq((1L, "u1", 10L), (2L, "u1", 25L), (3L, "u2", 5L), (4L, "u3", 7L))
      .toDF("id", "user", "t")
    val right = Seq(("u1", 10L, "a"), ("u1", 20L, "b"), ("u2", 6L, "c"))
      .toDF("user", "rt", "v")
    val got = Temporal.asofJoin(left, right, "user", "t", "rt")
      .orderBy("id").collect().toSeq
    assert(got === Seq(
      Row(1L, "u1", 10L, 10L, "a"),   // equal ts is a match (<=)
      Row(2L, "u1", 25L, 20L, "b"),   // latest prior, not first
      Row(3L, "u2", 5L, null, null),  // right exists but only later
      Row(4L, "u3", 7L, null, null))) // key absent from right
  }

  test("asofJoin matches the naive join+argmax formulation on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("value")).as("click_value"))
    val fast = Temporal.asofJoin(purchases, clicks, "user_id", "ts", "click_ts")
    // naive: expand every (purchase x prior click) pair, keep the max —
    // the formulation that dies on hot keys at scale
    val naive = purchases.alias("p")
      .join(clicks.alias("c"),
        col("p.user_id") === col("c.user_id") && col("c.click_ts") <= col("p.ts"), "left")
      .groupBy(col("p.event_id").as("event_id"), col("p.user_id").as("user_id"),
        col("p.ts").as("ts"))
      .agg(max(struct(col("c.click_ts"), col("c.click_value"))).as("m"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("m.click_ts").as("click_ts"), col("m.click_value").as("click_value"))
    assert(fast.count() === purchases.count()) // left outer: no row loss
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("funnelSteps: stepB before the user's first stepA is not a conversion") {
    val ev = Seq(
      ("u1", "signup", 10L), ("u1", "purchase", 20L),               // converts, gap 10 s
      ("u2", "purchase", 5L), ("u2", "signup", 10L), ("u2", "purchase", 30L), // gap 20 s
      ("u3", "view", 1L),                                           // never reaches
      ("u4", "signup", 40L)                                         // reaches, no purchase
    ).toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val row = Temporal.funnelSteps(ev).collect().head
    assert(row === Row(4L, 3L, 2L, 15e6)) // avg of 10 s and 20 s, in micros
  }

  test("rollingDaily: trailing frame spans observed days, exact ratio") {
    val ev = Seq.concat(
      Seq.fill(2)("2024-01-01"), Seq.fill(1)("2024-01-02"), Seq.fill(3)("2024-01-04"))
      .toDF("d").withColumn("ts", to_timestamp(col("d")))
    val got = Temporal.rollingDaily(ev, windowDays = 7)
      .orderBy("date").collect().toSeq.map(r =>
        (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got === Seq(
      ("2024-01-01", 2L, 2L, 1L, 2.0),
      ("2024-01-02", 1L, 3L, 2L, 1.5),
      ("2024-01-04", 3L, 6L, 3L, 2.0)))
  }

  test("eventPivot: declared domain, absent cells are 0 not NULL") {
    val ev = Seq(("2024-01-01", "click"), ("2024-01-01", "click"), ("2024-01-02", "view"))
      .toDF("d", "event_type").withColumn("ts", to_timestamp(col("d")))
    val got = Analytics.eventPivot(ev).orderBy("date").collect().toSeq
    assert(got.map(_.toSeq.drop(1)) === Seq(
      Seq(2L, 0L, 0L, 0L, 0L),
      Seq(0L, 0L, 0L, 0L, 1L)))
  }

  test("rollupCounts: gid 0=leaf, 1=source subtotal, 3=grand total") {
    val d = Seq(("en", "a", 10L), ("en", "b", 20L), ("de", "a", 30L))
      .toDF("lang", "source", "n_chars")
    val got = Analytics.rollupCounts(d).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2), r.getLong(4)))
      .toSet
    assert(got === Set(
      (Some("en"), Some("a"), 1L, 0L), (Some("en"), Some("b"), 1L, 0L),
      (Some("de"), Some("a"), 1L, 0L),
      (Some("en"), None, 2L, 1L), (Some("de"), None, 1L, 1L),
      (None, None, 3L, 3L)))
  }

  test("scrubBoilerplate: every token of a frequent bigram goes, chains included") {
    val d = Seq(
      (1L, "x a b y"), (2L, "a b z"), (3L, "q a a a")
    ).toDF("doc_id", "text")
    // "a b" (2 occurrences) and "a a" (2, overlapping chain) top the count
    val got = Corpus.scrubBoilerplate(d, topN = 2).orderBy("doc_id")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Seq(
      (1L, 4L, 2L, "x y"),
      (2L, 3L, 2L, "z"),
      (3L, 4L, 3L, "q"))) // a a a: all three tokens sit in an "a a" bigram
  }

  test("asofJoin equals argmax-over-intervalJoin on a random event set (cross-validation)") {
    // the two temporal joins implement the same relation from opposite
    // ends: as-of = the LATEST in-window right per left when the
    // window is unbounded — so each checks the other
    val rnd = new scala.util.Random(31)
    val lefts = (1L to 60L).map(i =>
      (i, i % 7L, java.sql.Timestamp.valueOf(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      .toDF("event_id", "user_id", "ts")
    val rights = (1L to 40L).map(i =>
      (i % 7L, java.sql.Timestamp.valueOf(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i))
      .toDF("user_id", "r_ts", "r_id")
      .groupBy("user_id", "r_ts").agg(max("r_id").as("r_id")) // unique (key, ts)
    val asof = Temporal.asofJoin(lefts, rights, "user_id", "ts", "r_ts")
      .filter(col("r_ts").isNotNull)
      .select("event_id", "r_ts").as[(Long, java.sql.Timestamp)].collect().toMap
    // interval join with a window covering everything, match must be <= ts
    val viaInterval = Temporal.intervalJoin(
      rights.select(col("user_id"), col("r_ts"), col("r_id")), lefts,
      "user_id", "r_ts", "ts", window = "INTERVAL 2 DAYS")
      // intervalJoin's contract is (leftTs, leftTs+w]; flipped operands
      // give us r_ts < ts <= r_ts + 2d, i.e. rights strictly BEFORE ts
      .groupBy(col("event_id")).agg(max(col("r_ts")).as("best"))
      .as[(Long, java.sql.Timestamp)].collect().toMap
    // asof is inclusive (r_ts <= ts), interval flip is strict — compare
    // on events whose match is strictly earlier under both
    viaInterval.foreach { case (id, best) =>
      assert(asof(id).getTime >= best.getTime,
        s"asof pick for $id must be at least the interval argmax")
    }
    assert(viaInterval.keySet.subsetOf(asof.keySet))
  }

  test("scrubBoilerplate native expression is bit-identical to the declarative HOF form") {
    // random token streams over a tiny vocab force heavy bigram
    // repetition, case variance exercises the lowercase matching,
    // single-token and empty-ish docs hit the no-bigram edge
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "B", "cc", "Dd", "e", "#")
    val rows = (1L to 60L).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (99L, "solo")
    val d = rows.toDF("doc_id", "text")
    val native = Corpus.scrubBoilerplate(d, topN = 3)
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val declarative = Corpus.scrubBoilerplateDeclarative(d, topN = 3)
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(native === declarative)
    assert(native.size === rows.size)
  }

  test("topicTerms: a source-exclusive term outranks shared vocabulary") {
    val d = Seq(
      ("s1", "quark quark common"), ("s2", "common common boson"), ("s3", "common")
    ).toDF("source", "text")
    val top = Corpus.topicTerms(d, k = 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4))).toSet
    // idf: exclusive term df=1 → n/df=3; "common" df=3 → 1.0
    assert(top === Set(("s1", "quark", 6.0), ("s2", "boson", 3.0), ("s3", "common", 1.0)))
  }
}
