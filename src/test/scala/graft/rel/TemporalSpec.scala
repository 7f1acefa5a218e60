package graft.rel

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Temporal operators (TemporalQueries): RANGE-frame semantics, sketch
  * bounds, and stream-static enrichment. Oracle parity is gated by
  * Verify/check.py; these assert the semantic/plan properties.
  */
class TemporalSpec extends SparkSpec {

  test("q_trailing_24h: RANGE frame counts its own row and only 24h back") {
    val out = SparkEntry.defs("q_trailing_24h").build(spark, sf()).cache()
    assert(out.filter(col("n_24h") < 1).count() == 0,
      "every event's trailing frame includes itself")
    // brute-force check on one user: frame = value-distance, not rows
    val ev = graft.Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val u = ev.groupBy("user_id").count().orderBy(desc("count")).head().getLong(0)
    val rows = ev.filter(col("user_id") === u).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val brute = rows.map { case (id, t) =>
      (id, rows.count { case (_, t2) => t2 <= t && t2 >= t - TemporalQueries.TrailUs }.toLong)
    }.toMap
    val got = out.join(ev.filter(col("user_id") === u), "event_id")
      .select("event_id", "n_24h").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute, "RANGE frame must match the brute-force 24h count")
    out.unpersist()
  }

  test("q_uniques_cumulative: monotone, ends at total uniques, bound holds") {
    val out = SparkEntry.defs("q_uniques_cumulative").build(spark, sf()).cache()
    val rows = out.orderBy("day").collect()
    assert(rows.sliding(2).forall(p => p.length < 2 ||
      p(0).getLong(1) <= p(1).getLong(1)), "cumulative uniques must be monotone")
    val total = graft.Tables.events(spark, sf())
      .select(countDistinct("user_id")).head().getLong(0)
    assert(rows.last.getLong(1) == total, "final day must equal total distinct users")
    assert(rows.forall(_.getBoolean(2)), "HLL estimate must stay within 2.5 sigma")
    out.unpersist()
  }

  test("q_trailing_24h plans one (user, chunk) shuffle and a RANGE window") {
    spark.catalog.clearCache()
    val p = SparkEntry.defs("q_trailing_24h").build(spark, sf())
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("RangeFrame"), s"window must be a RANGE frame:\n$p")
    // (user_id, chunk) hash exchange + output-order range exchange only —
    // the chunked key is the hot-user parallelism axis (see the builder)
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 2, p)
    assert(p.contains("chunk"), "window must partition by the 24h chunk")
  }

  test("q_retention: day-0 retention is 1.0 and ratios never exceed it") {
    val out = SparkEntry.defs("q_retention").build(spark, sf()).cache()
    assert(out.filter(col("k") === 0 && col("retention") =!= 1.0).count() == 0,
      "every cohort member is active on its first day")
    assert(out.filter(col("retention") > 1.0 || col("retention") <= 0.0).count() == 0)
    val total = graft.Tables.events(spark, sf())
      .select(countDistinct("user_id")).head().getLong(0)
    assert(out.filter(col("k") === 0).agg(sum("cohort_n")).head().getLong(0) == total,
      "cohort sizes at k=0 must partition the user base")
    out.unpersist()
  }

  test("q_concurrency: per-day peaks match a brute-force sweep; session " +
    "count agrees with q_events_sessionize") {
    val out = SparkEntry.defs("q_concurrency").build(spark, sf()).cache()
    // total sessions started == the sessionize query's total
    val nSess = SparkEntry.defs("q_events_sessionize").build(spark, sf())
      .agg(sum("n_sessions")).head().getLong(0)
    assert(out.agg(sum("n_started")).head().getLong(0) == nSess)
    // brute force: evaluate active-session count at every boundary instant
    val gapUs = 1800L * 1000000L
    val evs = graft.Tables.events(spark, sf())
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { rows =>
        val ts = rows.map(_._2).sorted
        val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var s = ts.head; var prev = ts.head
        for (t <- ts.tail) {
          if (t - prev > gapUs) { bounds += ((s, prev)); s = t }
          prev = t
        }
        bounds += ((s, prev)); bounds
      }.toSeq
    val usPerDay = 86400L * 1000000L
    def day(us: Long): Long = Math.floorDiv(us, usPerDay)
    val brute = evs.flatMap { case (s, e) => Seq(s, e) }.distinct.map { t =>
      (day(t), evs.count { case (s, e) => s <= t && e >= t }.toLong)
    }.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).max }
    val gotRows = out.collect().map(r =>
      r.getDate(0).toLocalDate.toEpochDay ->
        (r.getLong(2) /* carry_in */, r.getLong(3) /* peak */)).toMap
    // every boundary-sampled day must match; carry-only days (a session
    // spanning the whole day, no boundary inside) fall back to carry
    assert(brute.keySet.subsetOf(gotRows.keySet))
    brute.foreach { case (d, m) =>
      assert(gotRows(d)._2 == m, s"day $d: got ${gotRows(d)._2}, brute $m")
    }
    (gotRows.keySet -- brute.keySet).foreach { d =>
      assert(gotRows(d)._2 == gotRows(d)._1, s"carry-only day $d")
    }
    out.unpersist()
  }

  test("q_stream_session emits exactly the batch session count") {
    val out = SparkEntry.defs("q_stream_session").build(spark, sf())
    val nSess = SparkEntry.defs("q_events_sessionize").build(spark, sf())
      .agg(sum("n_sessions")).head().getLong(0)
    assert(out.count() == nSess,
      "streaming session_window must produce one row per batch session")
  }

  test("q_stream_enrich joins every event exactly once, no nulls") {
    val out = SparkEntry.defs("q_stream_enrich").build(spark, sf())
    val n = graft.Tables.events(spark, sf()).count()
    assert(out.count() == n, "stateless enrich must preserve cardinality")
    assert(out.filter(col("first_day").isNull || col("n_user_events").isNull)
      .count() == 0)
  }
}
