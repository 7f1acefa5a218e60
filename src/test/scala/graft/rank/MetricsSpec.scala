package graft.rank

import graft.SparkSpec

/** Closed-form HR/NDCG/MRR checks (my_utils.py:70-80 formulas). */
class MetricsSpec extends SparkSpec {

  test("metrics match closed forms for known ranks") {
    import spark.implicits._
    // Two users in one domain; candidate scores chosen so the positive
    // lands at rank 1 for user 1 and rank 3 for user 2.
    val scored = Seq(
      (1L, "x", 100L, 9.0, 1), (1L, "x", 101L, 5.0, 0), (1L, "x", 102L, 1.0, 0),
      (2L, "x", 100L, 2.0, 1), (2L, "x", 101L, 5.0, 0), (2L, "x", 102L, 9.0, 0))
      .toDF("user_id", "domain", "item_id", "score", "is_positive")
    val m = Metrics.rankingMetrics(scored, Seq(2)).collect().head
    // HR@2 = (1 + 0)/2; NDCG@2 = (log2/log2 + 0)/2; MRR@2 = (1/1 + 0)/2
    assert(m.getAs[Long]("n_users") == 2)
    assert(m.getAs[Double]("hr") == 0.5)
    assert(m.getAs[Double]("ndcg") == 0.5)
    assert(m.getAs[Double]("mrr") == 0.5)
  }

  test("ndcg discounts by log2(rank+1) and ties break by item_id") {
    import spark.implicits._
    // positive at rank 2 (tie on score broken by smaller item_id first)
    val scored = Seq(
      (1L, "x", 100L, 5.0, 0), (1L, "x", 101L, 5.0, 1), (1L, "x", 102L, 1.0, 0))
      .toDF("user_id", "domain", "item_id", "score", "is_positive")
    val m = Metrics.rankingMetrics(scored, Seq(10)).collect().head
    val expectNdcg = math.log(2.0) / math.log(3.0)
    assert(math.abs(m.getAs[Double]("ndcg") - expectNdcg) < 1e-6)
    assert(m.getAs[Double]("mrr") == 0.5)
    assert(m.getAs[Double]("hr") == 1.0)
  }

  test("positive outside k scores zero") {
    import spark.implicits._
    val scored = Seq(
      (1L, "x", 100L, 1.0, 1), (1L, "x", 101L, 5.0, 0), (1L, "x", 102L, 9.0, 0))
      .toDF("user_id", "domain", "item_id", "score", "is_positive")
    val m = Metrics.rankingMetrics(scored, Seq(2)).collect().head
    assert(m.getAs[Double]("hr") == 0.0)
    assert(m.getAs[Double]("ndcg") == 0.0)
    assert(m.getAs[Double]("mrr") == 0.0)
  }
}
