package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Sketch cross-validation: Spark's built-in HLL++ and quantile
  * sketches against this library's EXACT counterparts. The exact forms
  * are what the registry verifies (deterministic, oracle-checkable);
  * the sketches are what a 100 TB interactive query uses when a
  * bounded-error answer in one map-side-combinable pass beats an
  * exact shuffle. These specs pin the error actually delivered on a
  * known distribution, so "swap exact for approx at scale" is a
  * measured trade, not folklore.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // zipf-ish: value v appears ~ 40000/v times, 1..400 -> ~40k rows,
    // heavy head + long tail, the shape corpus stats actually have
    val rows = (1 to 400).flatMap(v => Seq.fill(4000 / v + 1)(v.toLong))
    rows.toDF("v")
  }

  test("approx_count_distinct lands within the configured rsd on a skewed column") {
    val df = (1L to 20000L).map(i => i % 3777L).toDF("u")
    val (exact, approx) = df
      .agg(countDistinct(col("u")), approx_count_distinct(col("u"), rsd = 0.02))
      .as[(Long, Long)].head()
    assert(exact === 3777L) // residues 0..3776 all hit
    val relErr = math.abs(approx.toDouble - exact) / exact
    assert(relErr < 0.05, s"HLL++ rel error $relErr vs rsd 0.02 (approx=$approx exact=$exact)")
  }

  test("sketch audits hold their contracts on real data and catch a broken tolerance") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val d = Corpus.sketchDistinctAudit(docs).collect()
    assert(d.nonEmpty && d.forall(_.getAs[Boolean]("hll_ok")),
      "HLL++ must land within tolerance on every source")
    val q = Corpus.sketchQuantileAudit(docs).collect()
    assert(q.nonEmpty && q.forall(_.getAs[Boolean]("approx_ok")),
      "every GK probe must satisfy its rank guarantee")
    // the boolean is a live check, not a constant: at a cardinality
    // past HLL++'s exact sparse mode the estimate is inexact (pinned
    // by the assume, deterministic for a given Spark build), so an
    // impossible tolerance must flip it
    val big = (1L to 60000L).map(i => (i, s"t$i", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (bigExact, bigHll) = big
      .agg(countDistinct(col("text")), approx_count_distinct(col("text"), rsd = 0.02))
      .as[(Long, Long)].head()
    assume(bigExact != bigHll, "sparse-exact regime; liveness probe needs more cardinality")
    val broken = Corpus.sketchDistinctAudit(big, tol = 0.0).collect()
    assert(broken.exists(!_.getAs[Boolean]("hll_ok")),
      "tol=0 must fail on an inexact estimate, or the audit asserts nothing")
  }

  test("approx_percentile brackets the exact type-1 quantiles on a zipf head") {
    val exact = Corpus.exactPercentiles(skewed, col("v"))
      .select("p25", "p50", "p75", "p95")
      .as[(Long, Long, Long, Long)].head()
    val approx = skewed
      .select(percentile_approx(col("v"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(10000)).as("q"))
      .as[Seq[Long]].head()
    // at accuracy 10000 on 40k rows, the sketch should land within one
    // value-domain step of the exact type-1 quantile at every probe
    val exactSeq = Seq(exact._1, exact._2, exact._3, exact._4)
    exactSeq.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) <= 1L, s"approx $a vs exact $e")
    }
  }

  private def mgSketch(df: org.apache.spark.sql.DataFrame, k: Int) = {
    GraftExtensions.register(spark)
    df.agg(call_function("graft_freq_items", col("term"), lit(k)).as("items"))
      .select(explode(col("items")).as("it"))
      .select(col("it.term"), col("it.est"))
      .as[(String, Long)].collect().toMap
  }

  test("graft_freq_items is exact while distinct terms fit the k counters") {
    val df = Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")
    val out = mgSketch(df.toDF("term"), k = 8)
    assert(out === Map("a" -> 7L, "b" -> 4L, "c" -> 2L))
  }

  test("graft_freq_items honors the Misra-Gries bound on a skewed stream, any partitioning") {
    // 1000 'hot' + 40 distinct cold singletons + 200 'warm': N=1240, k=4
    // bound: exact - est <= N/(k+1) = 248; hot (1000 > 248) MUST appear
    val terms = Seq.fill(1000)("hot") ++ (0 until 40).map(i => s"cold$i") ++
      Seq.fill(200)("warm")
    val exact = terms.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    for (parts <- Seq(1, 3, 13)) {
      val out = mgSketch(terms.toDF("term").repartition(parts), k = 4)
      assert(out.size <= 4)
      assert(out.contains("hot"), s"heavy hitter lost at parts=$parts: $out")
      out.foreach { case (t, est) =>
        assert(est <= exact(t), s"$t overcounted: $est > ${exact(t)}")
        assert(exact(t) - est <= 1240L / 5, s"$t error past the MG bound")
      }
    }
  }

  test("bloomFilterAudit: members never missed, fp rate within bound, any partitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    for (df <- Seq(docs, docs.repartition(13))) {
      val r = Corpus.bloomFilterAudit(df).collect().head
      assert(r.getAs[Boolean]("no_false_negatives"), s"bloom missed a member: $r")
      assert(r.getAs[Boolean]("fp_ok"), s"fp rate past the bound: $r")
      assert(r.getAs[Long]("n_probed") === df.count())
    }
  }

  test("heavyHittersAudit passes its contract on real data") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Corpus.heavyHittersAudit(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("heavy_found") === r.getAs[Long]("heavy_terms"),
        s"guaranteed-present heavy term missing from the sketch: $r")
      assert(r.getAs[Boolean]("bound_ok") && r.getAs[Boolean]("underestimate_ok"), s"$r")
    }
  }
}