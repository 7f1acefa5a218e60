package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The generalized sorted-pass funnel must agree with the fixed 3-stage
  * join-chain formulation — same greedy earliest-strictly-after
  * semantics, different plan shape.
  */
class FunnelSpec extends SparkSpec {

  test("funnelStages at 3 stages equals the join-chain q_events_funnel") {
    val chain = graft.SparkEntry.defs("q_events_funnel")
      .build(spark, sf()).collect().head
    val general = EventQueries
      .funnelStages(spark, sf(), Seq("signup", "click", "purchase"))
      .collect()
    assert(general.length == 3)
    val byStage = general.map(r =>
      r.getAs[Long]("stage_idx") -> r).toMap
    assert(byStage(1L).getAs[Long]("n_users") == chain.getAs[Long]("n_signup"))
    assert(byStage(2L).getAs[Long]("n_users") == chain.getAs[Long]("n_click_after"))
    assert(byStage(3L).getAs[Long]("n_users") == chain.getAs[Long]("n_purchase_after"))
    assert(byStage(3L).getAs[Long]("sum_gap_us") == chain.getAs[Long]("sum_funnel_us"))
  }

  test("a stage no user reaches still reports a zero row (oracle parity)") {
    // the oracle's per-stage UNION ALL branch is an ungrouped aggregate
    // that always emits one row — an unreached stage must not vanish
    val rows = EventQueries
      .funnelStages(spark, sf(), Seq("signup", "refund", "click"))
      .collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("signup", "refund", "click"))
    val dead = rows.filter(_.getAs[Long]("n_users") == 0L)
    assert(dead.map(_.getAs[String]("stage")).toSet == Set("refund", "click"))
    assert(dead.forall(_.getAs[Long]("sum_gap_us") == 0L))
  }

  test("4-stage funnel is monotone and stage names line up") {
    val rows = EventQueries
      .funnelStages(spark, sf(), EventQueries.FUNNEL_N_STAGES).collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      EventQueries.FUNNEL_N_STAGES)
    val counts = rows.map(_.getAs[Long]("n_users")).toSeq
    assert(counts == counts.sorted.reverse, s"funnel must narrow: $counts")
    assert(counts.head > 0)
  }
}
