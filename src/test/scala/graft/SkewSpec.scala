package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Skew-hardening rewrites must be result-identical to the plain
  * forms — the whole point is changing the SHAPE, not the answer. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90%), several cold ones — repartitioned so the hot
  // key genuinely spans input partitions
  private lazy val skewed = ((1 to 900).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"cold${i % 10}", i.toLong)))
    .toDF("k", "v").repartition(8)

  test("saltedCount equals the plain groupBy count") {
    val salted = Skew.saltedCount(skewed, col("k")).orderBy("key")
      .as[(String, Long)].collect()
    val plain = skewed.groupBy(col("k").as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy("key").as[(String, Long)].collect()
    assert(salted.toSeq === plain.toSeq)
    assert(salted.find(_._1 == "hot").get._2 === 900L)
  }

  test("saltedCount's first phase actually splits the hot key") {
    val phase1 = skewed.groupBy(col("k").as("key"), Skew.salt(16).as("s"))
      .agg(count(lit(1))).filter(col("key") === "hot")
    assert(phase1.count() > 1L) // hot key spread across >1 salt bucket
  }

  test("skewReport surfaces the hot key's share exactly") {
    // 900 "hot" + 100 spread over 10 cold keys = 1000 rows, 11 keys
    val out = Skew.skewReport(skewed, col("k"), topK = 2)
      .as[(Long, Long, Long, Double, Long, Double)].head()
    val (nRows, nKeys, maxRows, maxShare, topkRows, topkShare) = out
    assert(nRows === 1000L && maxRows === 900L)
    assert(maxShare === 0.9)
    assert(topkRows > 900L && topkShare === topkRows.toDouble / 1000.0)
    assert(nKeys === skewed.select("k").distinct().count())
  }

  test("saltedJoin equals the plain join") {
    val dim = Seq(("hot", "H"), ("cold1", "C")).toDF("dk", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk")
      .groupBy(col("label")).agg(count(lit(1)).as("c"))
      .orderBy("label").as[(String, Long)].collect()
    val plain = skewed.join(dim, col("k") === col("dk"))
      .groupBy(col("label")).agg(count(lit(1)).as("c"))
      .orderBy("label").as[(String, Long)].collect()
    assert(salted.toSeq === plain.toSeq)
  }
}
