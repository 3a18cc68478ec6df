package graft

import graft.operators.{Ann, Dedup}
import org.apache.spark.sql.functions._

/** The rows-only approximate operators have no DuckDB oracle; this
  * suite cross-validates them against their EXACT counterparts on the
  * real test corpus (which carries planted near-duplicate pairs well
  * separated from the ~0.02 background similarity). */
class CrossValidationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col(df.columns(0)), col(df.columns(1))).as[(Long, Long)].collect().toSet

  test("minhash recovers every exact-Jaccard >= 0.8 pair (100% recall on separated data)") {
    val docs = Tables.documents(spark, dir)
    val exact = pairs(Dedup.ngramJaccardPairs(docs, threshold = 0.8))
    val approx = pairs(Dedup.minhashPairs(docs, threshold = 0.6))
    assert(exact.nonEmpty) // the corpus really has planted dups
    assert(exact.subsetOf(approx))
    // and no background pair sneaks in: every candidate is a true near-dup at 0.5
    val exactLoose = pairs(Dedup.ngramJaccardPairs(docs, threshold = 0.5))
    assert(approx.subsetOf(exactLoose))
  }

  test("simhash pairs are a subset of the exact near-dup pairs") {
    val docs = Tables.documents(spark, dir)
    val sim = pairs(Dedup.simhashPairs(docs))
    val exactLoose = pairs(Dedup.ngramJaccardPairs(docs, threshold = 0.5))
    assert(sim.nonEmpty)
    assert(sim.subsetOf(exactLoose))
  }

  test("LSH and IVF rank-1 results agree with brute force for most queries") {
    val emb = Tables.embeddings(spark, dir)
    def rank1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(col("rank") === 1).select("query_id", "vec_id")
        .as[(Long, Long)].collect().toMap
    val bf = rank1(Ann.bruteForceTopK(emb, numQueries = 5, k = 1))
    val lsh = rank1(Ann.lshTopK(emb, numQueries = 5, k = 1))
    val ivf = rank1(Ann.ivfTopK(emb, numQueries = 5, k = 1))
    assert(bf.size === 5)
    // approximate methods can miss, but on 5 queries at least one
    // rank-1 should be exact for each method — and usually more
    assert(lsh.count { case (q, v) => bf.get(q).contains(v) } >= 1)
    assert(ivf.count { case (q, v) => bf.get(q).contains(v) } >= 1)
  }
}
