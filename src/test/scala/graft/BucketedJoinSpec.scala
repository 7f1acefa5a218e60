package graft

import org.apache.spark.sql.functions._

/** Proof of the cluster-scale claim the scaladocs make: fact⋈fact joins
  * become SHUFFLE-FREE when both sides are bucketed on the join key.
  * Writes bucketed copies of orders/lineitem and asserts the join plan
  * contains no Exchange on either side (sort-merge over pre-bucketed
  * scans).
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed orders JOIN lineitem plans without a shuffle") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      Tables.orders(spark, sf()).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
      Tables.lineitem(spark, sf()).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      joined.collect() // force execution so the adaptive plan is final
      val plan = joined.queryExecution.executedPlan.toString
      // the JOIN reads pre-bucketed data: no exchange on either join key
      // (the aggregation above it keys on a different column and may
      // legitimately shuffle)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"), "expected a co-located merge join")
      // same join WITHOUT bucketing shuffles both join inputs
      val unbucketed = Tables.orders(spark, sf())
        .join(Tables.lineitem(spark, sf()), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      unbucketed.collect()
      val uplan = unbucketed.queryExecution.executedPlan.toString
      assert(uplan.contains("Exchange hashpartitioning(o_orderkey") &&
        uplan.contains("Exchange hashpartitioning(l_orderkey"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
