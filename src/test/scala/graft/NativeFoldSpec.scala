package graft

import org.apache.spark.sql.functions._

/** r20's native hot-path expressions pinned BIT-FOR-BIT to the
  * declarative twins they replaced — the optimization round's
  * correctness contract: a fused expression must be a pure plan-shape
  * change, never a value change.
  *
  *  - `graft_pq_encode`     vs explode + codebook join + l2sq HOF +
  *                          struct-sort argmin + groupBy reassembly
  *  - `graft_adc_dist`      vs the zip_with/element_at/aggregate fold
  *  - `graft_sorted_fold_sum_arr` vs posexplode + per-(pos) sorted fold
  *  - `graft_fold_sum_arr`  vs per-(pos) sum
  *  - `graft_pair_combos`   vs the nested-transform pair explode
  */
class NativeFoldSpec extends SparkSpec {
  import spark.implicits._
  graft.GraftExtensions.register(spark)

  /** deterministic ragged-ish doubles: 12 vectors × 8 dims with sign
    * and magnitude variety (incl. exact ties for the argmin tie rule) */
  private def vecs = (0 until 12).map { i =>
    (i.toLong, (0 until 8).map(j => ((i * 31 + j * 17) % 13 - 6) * 0.25))
  }.toDF("vec_id", "emb")

  /** a 2-subspace × 3-cell codebook with one duplicated cell vector so
    * the (d², cell) tie breaks to the lower cell id */
  private def cbRows = Seq(
    (0, 0L, Seq(0.0, 0.0, 0.0, 0.0)), (0, 1L, Seq(1.0, -1.0, 0.5, 0.25)),
    (0, 2L, Seq(0.0, 0.0, 0.0, 0.0)), // duplicate of cell 0 → ties
    (1, 0L, Seq(-0.5, 0.5, -0.25, 1.0)), (1, 1L, Seq(0.0, 1.0, 0.0, -1.0)),
    (1, 2L, Seq(0.25, 0.25, 0.25, 0.25))
  ).toDF("sub", "cell", "cemb")

  private def subcents = cbRows
    .groupBy(col("sub")).agg(collect_list(struct(col("cell"), col("cemb"))).as("cents"))
    .agg(transform(array_sort(collect_list(struct(col("sub"), col("cents")))),
      p => p.getField("cents")).as("subcents"))

  private def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  test("graft_pq_encode == the declarative explode/join/sort chain, bit-for-bit") {
    val enc = vecs.crossJoin(broadcast(subcents))
      .select(col("vec_id"),
        call_function("graft_pq_encode", col("emb"), col("subcents")).as("enc"))
      .select(col("vec_id"), col("enc.codes").as("codes"),
        col("enc.d2s").as("d2s"), col("enc.qerr").as("qerr"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Double](2),
        r.getDouble(3))).sortBy(_._1)
    val scored = transform(col("cents"), c =>
      struct(l2sq(col("semb"), c.getField("cemb")).as("d2"),
        c.getField("cell").as("cell")))
    val twin = vecs.select(col("vec_id"), explode(array(
        struct(lit(0).as("sub"), slice(col("emb"), 1, 4).as("semb")),
        struct(lit(1).as("sub"), slice(col("emb"), 5, 4).as("semb")))).as("s"))
      .select(col("vec_id"), col("s.sub").as("sub"), col("s.semb").as("semb"))
      .join(broadcast(cbRows.groupBy(col("sub"))
        .agg(collect_list(struct(col("cell"), col("cemb"))).as("cents"))), Seq("sub"))
      .withColumn("b", element_at(array_sort(scored), 1))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("b.cell").as("code")))),
          p => p.getField("code")).as("codes"),
        transform(array_sort(collect_list(struct(col("sub"), col("b.d2").as("d2")))),
          p => p.getField("d2")).as("d2s"),
        call_function("graft_sorted_fold_sum",
          col("sub").cast("long"), col("b.d2")).as("qerr"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Double](2),
        r.getDouble(3))).sortBy(_._1)
    assert(enc === twin) // exact — same folds, same tie rule
    // the duplicated cell 2 never wins a tie against cell 0
    assert(enc.forall(_._2.head != 2L))
  }

  test("graft_adc_dist == the zip_with/element_at fold, including order") {
    val df = vecs.crossJoin(broadcast(subcents))
      .withColumn("enc", call_function("graft_pq_encode", col("emb"), col("subcents")))
      .withColumn("dtab", transform(col("subcents"), (cents, j) =>
        transform(array_sort(cents), c =>
          l2sq(slice(col("emb"), j * 4 + 1, lit(4)), c.getField("cemb")))))
      .select(col("vec_id"),
        call_function("graft_adc_dist", col("dtab"), col("enc.codes")).as("native"),
        aggregate(zip_with(col("dtab"), col("enc.codes"),
          (t, c) => element_at(t, (c + 1).cast("int"))),
          lit(0.0), (acc, v) => acc + v).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("sorted_fold_sum_arr == per-position sorted folds; fold_sum_arr == per-position sums") {
    val grouped = vecs.withColumn("g", (col("vec_id") % 3).cast("long"))
    val native = grouped.groupBy(col("g"))
      .agg(call_function("graft_sorted_fold_sum_arr", col("vec_id"), col("emb")).as("sx"))
      .select(col("g"), posexplode(col("sx")).as(Seq("pos", "x")))
    val twin = grouped.select(col("g"), col("vec_id"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("g"), col("pos"))
      .agg(call_function("graft_sorted_fold_sum", col("vec_id"), col("v")).as("x"))
    assert(native.join(twin, Seq("g", "pos"))
      .filter(native("x") =!= twin("x")).isEmpty)
    val nativeSum = grouped.groupBy(col("g"))
      .agg(call_function("graft_fold_sum_arr", col("emb")).as("sx"))
      .select(col("g"), posexplode(col("sx")).as(Seq("pos", "x")))
    val twinSum = grouped.select(col("g"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("g"), col("pos")).agg(sum(col("v")).as("x"))
    // tolerance-free: these inputs are dyadic rationals, every
    // summation order lands the same double
    assert(nativeSum.join(twinSum, Seq("g", "pos"))
      .filter(nativeSum("x") =!= twinSum("x")).isEmpty)
  }

  test("graft_pair_combos == the nested-transform pair explode, content and order") {
    val ds = Seq(Seq(3L, 7L, 9L, 12L), Seq(1L, 2L), Seq(5L), Seq.empty[Long])
      .toDF("ds")
    val native = ds.select(
      call_function("graft_pair_combos", col("ds")).as("p")).collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getLong(0), r.getLong(1))))
    val twin = ds.select(flatten(transform(col("ds"), (a, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          b => struct(a.as("d1"), b.as("d2"))))).as("p")).collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getLong(0), r.getLong(1))))
    assert(native.toSeq === twin.toSeq)
    assert(native.head === Seq((3L, 7L), (3L, 9L), (3L, 12L), (7L, 9L), (7L, 12L), (9L, 12L)))
  }

  test("hot-path expressions stay codegen-capable (r21: no CodegenFallback)") {
    // The r21 round restored whole-stage-codegen spans around these
    // expressions: the CodegenFallback trait ejects the ENTIRE
    // containing operator from codegen (CollapseCodegenStages checks
    // for the trait, not for a doGenCode body), so re-adding it — even
    // with a doGenCode override — would silently break the spans the
    // plan dumps pin. The value checks above run through the codegen'd
    // projections, so bit-exactness of doGenCode rides the same specs.
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.expressions.Literal
    val l = Literal(1L)
    Seq(
      functions.PqEncode(l, l),
      functions.AdcDist(l, l),
      functions.PairCombos(l),
      functions.IvfArgmin(l, l)
    ).foreach { e =>
      assert(!e.isInstanceOf[CodegenFallback],
        s"${e.prettyName} must not mix back in CodegenFallback")
    }
  }
}
