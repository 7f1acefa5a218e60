package graft.rel

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Series/maintenance operators (SeriesQueries) + linkage (LinkQueries):
  * semantic invariants on the real sf0.001 data and the plan properties
  * that carry the 100 TB claims (single scans, broadcasts, no global
  * windows). Oracle-parity itself is gated by Verify/check.py.
  */
class SeriesSpec extends SparkSpec {

  private def plan(name: String): String = {
    spark.catalog.clearCache()
    SparkEntry.defs(name).build(spark, sf())
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q_gap_fill: spine is dense per user and fills carry last close") {
    val out = SparkEntry.defs("q_gap_fill").build(spark, sf()).cache()
    // dense: per user, row count == day span + 1, no null closes
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("rows"), min("day").as("d0"), max("day").as("d1"))
      .withColumn("span", datediff(col("d1"), col("d0")) + 1)
    assert(spans.filter(col("rows") =!= col("span")).count() == 0,
      "every user must have exactly one row per calendar day in range")
    assert(out.filter(col("close").isNull).count() == 0,
      "forward fill must leave no nulls (spine starts at first observed day)")
    // a gap row's close equals the previous day's close
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val bad = out.withColumn("prev", lag("close", 1).over(w))
      .filter(col("is_gap") === 1 && col("close") =!= col("prev"))
    assert(bad.count() == 0, "gap rows must carry the previous close")
    out.unpersist()
  }

  test("q_histogram: bins partition the domain and counts sum to input") {
    val out = SparkEntry.defs("q_histogram").build(spark, sf()).cache()
    val nIn = graft.Tables.lineitem(spark, sf()).count()
    val nOut = out.agg(sum("n")).head().getLong(0)
    assert(nOut == nIn, s"histogram counts ($nOut) must sum to input rows ($nIn)")
    assert(out.filter(col("bin") < 0 || col("bin") >= SeriesQueries.HistBins).count() == 0)
    assert(out.filter(col("lo_mills") > col("hi_mills")).count() == 0)
    out.unpersist()
  }

  test("q_snapshot_diff: single scan, single shuffle — no self-join") {
    val p = plan("q_snapshot_diff")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "diff-over-one-table must rewrite to conditional aggregation, not a join")
    // one hash shuffle for the aggregate + the output ORDER BY's range
    // exchange — nothing else
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 2,
      s"expected agg + sort shuffles only:\n$p")
    // detail headers only — each physical node prints once as "(n) Scan"
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1,
      "orders must be scanned once")
  }

  test("q_incr_agg: merged base+delta partials equal the full recompute") {
    val merged = SparkEntry.defs("q_incr_agg").build(spark, sf())
    val full = graft.Tables.events(spark, sf())
      .groupBy(col("event_type"), to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,3)")), 2).cast("double").as("sum_value"))
    assert(merged.select("event_type", "day", "n", "sum_value")
      .exceptAll(full).count() == 0, "merge must equal full recompute")
    assert(merged.count() == full.count())
  }

  test("q_histogram extrema phase broadcasts (no global-window min/max)") {
    val p = plan("q_histogram")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "1-row extrema must broadcast back")
    assert(!p.contains("Window"), "no window function in the histogram plan")
  }

  test("q_fuzzy_join: pairs are symmetric-free, within threshold, and " +
    "match an unblocked brute force restricted to the block predicate") {
    import graft.ext.LinkQueries._
    val out = SparkEntry.defs("q_fuzzy_join").build(spark, sf()).cache()
    assert(out.filter(col("doc_a") >= col("doc_b")).count() == 0)
    assert(out.filter(col("dist") < 0 || col("dist") > MaxDist).count() == 0)
    // brute force with plain (unthresholded) levenshtein over blocked pairs
    val docs = graft.Tables.documents(spark, sf())
      .select(col("doc_id"), substring(col("text"), 1, BlockLen).as("blk"),
        substring(col("text"), 1, HeadLen).as("head"))
    val brute = docs.as("a").join(docs.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist", levenshtein(col("a.head"), col("b.head")))
      .filter(col("dist") <= MaxDist)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("dist"))
    assert(out.exceptAll(brute).count() == 0 && brute.exceptAll(out).count() == 0,
      "thresholded levenshtein must retain exactly the brute-force pairs")
    assert(out.count() > 0, "sf0.001 must contain near-dup heads")
    out.unpersist()
  }

  test("q_twa lies within each user's value range; q_rolling_z flags " +
    "only after a full 7-day warm-up") {
    val twa = SparkEntry.defs("q_twa").build(spark, sf())
    val rng = graft.Tables.events(spark, sf()).groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    assert(twa.join(rng, "user_id")
      .filter(col("twa") < col("lo") - 1e-6 || col("twa") > col("hi") + 1e-6)
      .count() == 0, "a convex time-weighted mean cannot leave the value range")
    val z = SparkEntry.defs("q_rolling_z").build(spark, sf()).cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val bad = z.withColumn("rn", row_number().over(w))
      .filter((col("rn") <= 7 && col("is_anomaly").isNotNull) ||
        (col("rn") > 7 && col("is_anomaly").isNull))
    assert(bad.count() == 0, "flag must be NULL exactly during warm-up")
    z.unpersist()
  }

  test("q_entropy: uniform source bounds and exact-token accounting") {
    val out = SparkEntry.defs("q_entropy").build(spark, sf()).cache()
    // H <= log2(vocab) (equality iff uniform), H >= 0
    val bad = out.filter(col("h_bits") < 0 ||
      col("h_bits") > round(log2(col("vocab").cast("double")) + 1e-6, 6))
    assert(bad.count() == 0, "entropy must lie in [0, log2(vocab)]")
    val nToks = graft.ext.TextOps.tokens(spark, sf()).count()
    assert(out.agg(sum("n")).head().getLong(0) == nToks)
    out.unpersist()
  }

  test("q_seasonality indices average to 1 and partition the event log") {
    val rows = graft.SparkEntry.defs("q_seasonality").build(spark, sf())
      .collect()
    assert(rows.map(_.getAs[Long]("hour")).toSeq.sorted == (0L to 23L))
    val total = graft.Tables.events(spark, sf()).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    // n-weighted mean of the seasonal index is 1 by construction
    val w = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("seasonal_index")).sum
    assert(math.abs(w / total - 1.0) < 1e-4)
    rows.foreach(r => assert(r.getAs[Double]("seasonal_index") > 0.0))
  }
}
