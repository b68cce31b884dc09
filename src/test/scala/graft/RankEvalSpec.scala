package graft

import org.apache.spark.sql.functions._

import graft.sim.RankEval

/** Ranking-metric goldens: recall@k, MRR, micro-quantized nDCG, and
  * the empty-relevance / no-hit edge semantics. */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def gm(pos: Int): Long =
    BigDecimal(1e6 / (math.log(pos + 1.0) / math.log(2.0)))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("per-query metrics: hit at rank 2 of two relevant docs") {
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // q1: hit = 11 @ rank 2
      (2L, 10L, 1),                             // q2: no relevance set
      (3L, 20L, 1), (3L, 21L, 5))               // q3: only hit OUTSIDE k
      .toDF("query_id", "neighbor_id", "rank")
    val relevant = Seq(
      (1L, 11L), (1L, 99L),
      (3L, 21L), (3L, 98L), (3L, 97L))
      .toDF("query_id", "neighbor_id")
    val m = RankEval.rankingMetrics(ranked, relevant, k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap

    val q1 = m(1L)
    assert(q1.getLong(1) == 2L && q1.getLong(2) == 1L)
    assert(q1.getAs[Double]("recall_at_k") == 0.5)
    assert(q1.getAs[Double]("mrr") == 0.5)
    // dcg = gain(2); idcg = gain(1) + gain(2), micro-exact
    val expect = BigDecimal(gm(2).toDouble / (gm(1) + gm(2)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q1.getAs[Double]("ndcg_at_k") == expect)

    val q2 = m(2L) // empty relevance: null recall/ndcg, mrr 0
    assert(q2.getLong(1) == 0L)
    assert(q2.isNullAt(q2.fieldIndex("recall_at_k")))
    assert(q2.getAs[Double]("mrr") == 0.0)
    assert(q2.isNullAt(q2.fieldIndex("ndcg_at_k")))

    val q3 = m(3L) // relevant exists, hit only beyond k → all zeros
    assert(q3.getLong(1) == 3L && q3.getLong(2) == 0L)
    assert(q3.getAs[Double]("recall_at_k") == 0.0)
    assert(q3.getAs[Double]("mrr") == 0.0)
    assert(q3.getAs[Double]("ndcg_at_k") == 0.0)

    intercept[ParameterError] {
      RankEval.rankingMetrics(ranked, relevant, k = 0)
    }
  }

  test("perfect ranking scores 1.0 everywhere; idcg truncates at k") {
    // 5 relevant docs, k = 3, top-3 all relevant: recall 3/5, ndcg 1.0
    val ranked = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val relevant = (1L to 5L).map((1L, _)).toDF("query_id", "neighbor_id")
    val r = RankEval.rankingMetrics(ranked, relevant, k = 3).head
    assert(r.getAs[Double]("recall_at_k") == 0.6)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(r.getAs[Double]("ndcg_at_k") == 1.0)
  }
}
