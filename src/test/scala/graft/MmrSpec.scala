package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Closed-form fixture for MMR re-ranking: a candidate list whose top-2 by
  * relevance are near-duplicates of each other. Pure relevance ranking
  * returns both; MMR with any meaningful diversity weight must skip the
  * duplicate in round 2 and take the diverse third candidate instead.
  */
class MmrSpec extends AnyFunSuite with SparkSpec {

  test("mmrRerank: the near-duplicate runner-up is displaced by the diverse candidate") {
    import spark.implicits._
    // candidates: 10 (rel .95), 11 (rel .94, sim .99 to 10), 12 (rel .60,
    // sim .10 to both), 13 (rel .55, sim .10)
    val cand = Seq((1L, 10L, 0.95), (1L, 11L, 0.94), (1L, 12L, 0.60), (1L, 13L, 0.55))
      .toDF("query_id", "neighbor_id", "rel")
    val sims = Seq(
      (10L, 11L, 0.99), (10L, 12L, 0.10), (10L, 13L, 0.10),
      (11L, 12L, 0.10), (11L, 13L, 0.10), (12L, 13L, 0.85))
    val psim = sims.flatMap { case (a, b, s) => Seq((1L, a, b, s), (1L, b, a, s)) }
      .toDF("query_id", "a", "b", "sim")
    val out = Similarity.mmrRerank(cand, psim, k = 3, wRel = 0.7, wDiv = 0.3)
      .select(col("round").as[Int], col("neighbor_id").as[Long])
      .collect().sortBy(_._1).map(_._2).toSeq
    // round 1: 10 (pure relevance). round 2: 11 scores .7*.94-.3*.99=.361,
    // 12 scores .7*.60-.3*.10=.390 -> 12 wins. round 3: 11 (.361) beats
    // 13 (.7*.55-.3*.85=.13, capped by sim to 12).
    assert(out == Seq(10L, 12L, 11L),
      s"MMR must displace the near-duplicate: got $out")
  }

  test("mmrRerank: with wDiv = 0 the order is pure relevance") {
    import spark.implicits._
    val cand = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7))
      .toDF("query_id", "neighbor_id", "rel")
    val psim = Seq((1L, 10L, 11L, 0.99), (1L, 11L, 10L, 0.99),
      (1L, 10L, 12L, 0.99), (1L, 12L, 10L, 0.99),
      (1L, 11L, 12L, 0.99), (1L, 12L, 11L, 0.99))
      .toDF("query_id", "a", "b", "sim")
    val out = Similarity.mmrRerank(cand, psim, k = 3, wRel = 1.0, wDiv = 0.0)
      .select(col("round").as[Int], col("neighbor_id").as[Long])
      .collect().sortBy(_._1).map(_._2).toSeq
    assert(out == Seq(10L, 11L, 12L))
  }
}
