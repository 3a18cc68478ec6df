package graft

/** The pure-SQL user surface: every native expression is registered as
  * a SQL function (`GraftExtensions`), so an analyst who only writes
  * `spark.sql(...)` gets the same engine — these specs pin that the
  * names resolve and compute from SQL text, not just from the Scala
  * `call_function` path the operators use. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.register(spark)

  test("vector natives compute from plain SQL") {
    Seq((1L, Seq(1.0, 2.0, 2.0))).toDF("id", "v").createOrReplaceTempView("vecs")
    val r = spark.sql(
      """SELECT graft_dot(v, v) AS d, graft_norm(v) AS n,
        |       graft_quantize_int8(v) AS q
        |FROM vecs""".stripMargin).head()
    assert(r.getAs[Double]("d") === 9.0)
    assert(r.getAs[Double]("n") === 3.0)
    assert(r.getAs[Seq[Double]]("q") === Seq(64.0, 127.0, 127.0))
  }

  test("text natives compute from plain SQL") {
    Seq(("a b c d", Seq("a b"))).toDF("t", "grams").createOrReplaceTempView("docs_sql")
    val r = spark.sql(
      """SELECT graft_shingles(t, 3) AS sh,
        |       graft_scrub_tokens(split(t, ' '), grams) AS s
        |FROM docs_sql""".stripMargin).head()
    assert(r.getAs[Seq[String]]("sh") === Seq("a b c", "b c d"))
    val s = r.getStruct(r.fieldIndex("s"))
    assert(s.getAs[Long]("n_removed") === 2L)
    assert(s.getAs[String]("scrubbed") === "c d")
  }

  test("aggregate natives compute from plain SQL") {
    Seq(1L, 2L, 3L).toDF("x").createOrReplaceTempView("xs")
    val r = spark.sql(
      "SELECT sort_array(graft_bounded_collect(x, 10)) AS l FROM xs").head()
    assert(r.getAs[Seq[Long]]("l") === Seq(1L, 2L, 3L))
    // over the cap -> NULL, the heavy-hitter contract
    val over = spark.sql(
      "SELECT graft_bounded_collect(x, 2) AS l FROM xs").head()
    assert(over.isNullAt(0))
  }

  test("md5 signature family computes from plain SQL; simhash dedups repeated elements") {
    // the portable (oracle-replayable) family — minhash, simhash, SRP
    val r = spark.sql(
      """SELECT graft_minhash_sig_md5(array('a b c', 'b c d'), 4) AS mh,
        |       graft_simhash_sig_md5(array('a b c', 'b c d')) AS sh,
        |       graft_srp_buckets_md5(array(1.0D, -2.0D), 2, 4) AS srp""".stripMargin).head()
    assert(r.getAs[Seq[Long]]("mh").length === 4)
    assert(r.getAs[Seq[Long]]("srp").length === 2)
    // DISTINCT-vote contract for ANY caller: a repeated element must
    // not double-vote (the SQL oracle replays a DISTINCT set)
    val dup = spark.sql(
      "SELECT graft_simhash_sig_md5(array('x y z', 'x y z', 'b c d')) AS sh").head()
    assert(dup.getAs[Long]("sh") === spark.sql(
      "SELECT graft_simhash_sig_md5(array('x y z', 'b c d')) AS sh").head().getAs[Long]("sh"))
  }

  test("a wrong arity fails analysis with the documented signature") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0)) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("graft_dot"))
  }
}
