package graft.rel

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series maintenance operators: date-spine gap filling with
  * forward fill, integer-exact equi-width histograms, snapshot diffing,
  * and incremental (partial-merge) aggregate maintenance.
  *
  * These are the lakehouse upkeep verbs around the reference's analytics
  * (reference has no equivalents — engine extensions like §2.9): a metric
  * store densifies per-entity daily series before feature extraction; a
  * profiler histograms columns; a CDC consumer diffs snapshots; a
  * lambda-architecture pipeline merges yesterday's aggregate with today's
  * delta instead of rescanning 100 TB.
  *
  * Parity rules (QueryDef): forward-filled values are COPIES (no
  * arithmetic → bit-exact); histogram bins are pure integer arithmetic
  * over DECIMAL-derived mills; diffs/merges keep DECIMAL until one final
  * mirrored round-cast.
  */
object SeriesQueries {

  private val M = DecimalType(18, 3)

  /** Histogram bin count (power of two keeps the integer math obvious). */
  val HistBins = 16

  /** Snapshot cutoff for the diff: orders strictly before this date form
    * the "old" snapshot; the full table is the "new" one.
    */
  val DiffCutoff = "1999-01-01"

  /** Incremental-maintenance cutoff: base = events before, delta = after. */
  val IncrCutoff = "2024-01-20"

  val defs: Map[String, QueryDef] = Map(

    // ---- q_seasonality: hour-of-day seasonal profile of event value —
    //      the decomposition a metric dashboard applies before calling
    //      an anomaly (is 3am low traffic or an outage?). Per hour
    //      0..23: exact mills count/sum in ONE map-side-combinable agg;
    //      the seasonal index mean_h / mean_global is computed from the
    //      24-row relation's window totals — exact integers to two
    //      mirrored double divisions. One events pass at any scale ----
    "q_seasonality" -> QueryDef(
      """WITH h AS (
        |  SELECT EXTRACT(hour FROM ts) AS hour, COUNT(*) AS n,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY 1
        |)
        |SELECT hour, n, round(CAST(s AS DOUBLE) / n / 1000.0, 6) AS mean_value,
        |  round((CAST(s AS DOUBLE) / n)
        |    / (CAST(SUM(s) OVER () AS DOUBLE) / SUM(n) OVER ()), 6)
        |    AS seasonal_index
        |FROM h ORDER BY hour""".stripMargin) { (spark, d) =>
      val all = Window.partitionBy(lit(1))
      Tables.events(spark, d)
        .groupBy(hour(col("ts")).cast("long").as("hour"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(value * 1000) AS BIGINT)")).cast("long").as("s"))
        .select(col("hour"), col("n"),
          round(col("s").cast("double") / col("n") / 1000.0, 6).as("mean_value"),
          round((col("s").cast("double") / col("n"))
            / (sum("s").over(all).cast("double") / sum("n").over(all)), 6)
            .as("seasonal_index"))
        .orderBy("hour")
    },

    // ---- q_gap_fill: per-user daily close, densified over each user's
    //      [first_day, last_day] date spine, gaps forward-filled from the
    //      last observed day. 100 TB: ONE shuffle on user_id; the spine
    //      explodes per user (bounded by that user's day span, never a
    //      global calendar cross join), and the close-pick window, spine
    //      join, and forward-fill window all share the user_id
    //      partitioning. The fill value is a COPY of an input double —
    //      no arithmetic — so parity is bit-exact by construction ----
    "q_gap_fill" -> QueryDef(
      s"""WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, value,
        |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |), daily AS (
        |  SELECT user_id, day, value AS day_close FROM ev WHERE rn = 1
        |), spine AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(min(day), max(day),
        |      INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM daily GROUP BY user_id
        |), j AS (
        |  SELECT s.user_id, s.day, d.day_close
        |  FROM spine s LEFT JOIN daily d
        |    ON s.user_id = d.user_id AND s.day = d.day
        |)
        |SELECT user_id, day,
        |  last_value(day_close IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS close,
        |  CASE WHEN day_close IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM j ORDER BY user_id, day""".stripMargin) { (spark, d) =>
      // last-event-of-day pick as max_by over the (ts, event_id) struct:
      // a map-side-combinable hash AGGREGATE — the row_number window the
      // oracle replays sorts every (user, day) partition instead (59s →
      // 23s at 100×, SCALING.md); identical result (same total order),
      // hash-gate-proven
      val daily = Tables.events(spark, d)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
          col("event_id"), col("value"))
        .groupBy("user_id", "day")
        .agg(expr("max_by(value, struct(ts, event_id))").as("day_close"))
      val spine = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val fill = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("day_close"), ignoreNulls = true).over(fill).as("close"),
          when(col("day_close").isNull, 1).otherwise(0).as("is_gap"))
        // row-neutral (the spine starts at each user's first OBSERVED day,
        // so the carry-forward is never null — SeriesSpec asserts it) but
        // it stops a bare count() from pruning the fill window
        .filter(col("close").isNotNull)
        .orderBy("user_id", "day")
    },

    // ---- q_histogram: equi-width histogram of extendedprice per
    //      returnflag. Two-phase like q_feature_scale: phase 1 is a
    //      1-ROW global-extrema aggregate broadcast back (never a min/max
    //      window over whole partitions); phase 2 is one hash aggregate.
    //      All arithmetic is INTEGER over DECIMAL-derived mills —
    //      ((v - lo) * 16) div (hi - lo + 1) — so bin boundaries are
    //      exact in both engines (no IEEE edge-of-bin coin flips) ----
    "q_histogram" -> QueryDef(
      s"""WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,3)) * 1000 AS BIGINT)
        |      AS mills
        |  FROM lineitem
        |), x AS (SELECT min(mills) AS lo, max(mills) AS hi FROM c)
        |SELECT l_returnflag,
        |  ((mills - lo) * $HistBins) // (hi - lo + 1) AS bin,
        |  COUNT(*) AS n, min(mills) AS lo_mills, max(mills) AS hi_mills
        |FROM c, x
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, d) =>
      val c = Tables.lineitem(spark, d)
        .select(col("l_returnflag"),
          (col("l_extendedprice").cast(M) * 1000).cast("long").as("mills"))
      val x = c.agg(min("mills").as("lo"), max("mills").as("hi"))
      c.crossJoin(broadcast(x))
        .withColumn("bin", expr(s"((mills - lo) * $HistBins) div (hi - lo + 1)"))
        .groupBy(col("l_returnflag"), col("bin"))
        .agg(count(lit(1)).as("n"),
          min("mills").as("lo_mills"), max("mills").as("hi_mills"))
        .orderBy("l_returnflag", "bin")
    },

    // ---- q_snapshot_diff: added/changed rows between the per-customer
    //      order aggregate as of $DiffCutoff and the current one. The
    //      textbook form full-outer-joins two snapshot scans; over ONE
    //      underlying table the engine-preferred form is conditional
    //      aggregation — a SINGLE scan and a SINGLE shuffle build both
    //      snapshots as FILTER'd aggregates, and the diff is a row-local
    //      comparison. At 100 TB that halves the I/O and removes the
    //      join exchange entirely ----
    "q_snapshot_diff" -> QueryDef(
      s"""SELECT c_custkey, status, n_old, n_new, total_old, total_new FROM (
        |  SELECT o_custkey AS c_custkey,
        |    COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '$DiffCutoff 00:00:00')
        |      AS n_old,
        |    COUNT(*) AS n_new,
        |    CAST(round(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,3)))
        |        FILTER (WHERE o_orderdate < TIMESTAMP '$DiffCutoff 00:00:00'), 0), 2)
        |      AS DOUBLE) AS total_old,
        |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,3))), 2) AS DOUBLE)
        |      AS total_new,
        |    CASE WHEN COUNT(*) FILTER (WHERE o_orderdate
        |        < TIMESTAMP '$DiffCutoff 00:00:00') = 0 THEN 'added'
        |      WHEN COUNT(*) FILTER (WHERE o_orderdate
        |        < TIMESTAMP '$DiffCutoff 00:00:00') < COUNT(*) THEN 'changed'
        |      ELSE 'same' END AS status
        |  FROM orders GROUP BY o_custkey)
        |WHERE status <> 'same'
        |ORDER BY c_custkey""".stripMargin) { (spark, d) =>
      val cutoff = to_timestamp(lit(s"$DiffCutoff 00:00:00"))
      val old = col("o_orderdate") < cutoff
      Tables.orders(spark, d)
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(
          count(when(old, 1)).as("n_old"),
          count(lit(1)).as("n_new"),
          round(coalesce(sum(when(old, col("o_totalprice").cast(M))), lit(0).cast(M)), 2)
            .cast("double").as("total_old"),
          round(sum(col("o_totalprice").cast(M)), 2).cast("double").as("total_new"))
        .withColumn("status",
          when(col("n_old") === 0, "added")
            .when(col("n_old") < col("n_new"), "changed")
            .otherwise("same"))
        .filter(col("status") =!= "same")
        .select("c_custkey", "status", "n_old", "n_new", "total_old", "total_new")
        .orderBy("c_custkey")
    },

    // ---- q_rolling_z: rolling z-score anomaly flags over the per-type
    //      daily series — ENTIRELY in integer arithmetic. The trailing-7
    //      (strictly prior) window carries exact BIGINT Σx and Σx² of
    //      the mills series; the |z| > 2 test is the cross-multiplied
    //      identity (7x − S)² > 4·(7·SS − S²) so no division, sqrt, or
    //      float EVER occurs (population σ over the full 7-day frame;
    //      days with fewer than 7 priors emit flag = NULL). 100 TB: the
    //      day-level series is already tiny per type; the pattern is the
    //      point — exact streaming-frame moments make anomaly flags
    //      bit-reproducible across engines and reruns ----
    "q_rolling_z" -> QueryDef(
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,3))) * 1000 AS DECIMAL(18,0))
        |      AS BIGINT) AS mills
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, day, mills,
        |    COUNT(*) OVER w AS n7,
        |    CAST(SUM(mills) OVER w AS BIGINT) AS s7,
        |    SUM(CAST(mills AS HUGEINT) * mills) OVER w AS ss7
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, day, mills,
        |  CASE WHEN n7 = 7 THEN
        |    CASE WHEN (7 * CAST(mills AS HUGEINT) - s7)
        |        * (7 * CAST(mills AS HUGEINT) - s7)
        |      > 4 * (7 * CAST(ss7 AS HUGEINT) - CAST(s7 AS HUGEINT) * s7)
        |      THEN 1 ELSE 0 END
        |  ELSE NULL END AS is_anomaly
        |FROM m ORDER BY event_type, day""".stripMargin) { (spark, d) =>
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-7, -1)
      Tables.events(spark, d)
        .groupBy(col("event_type"),
          to_date(date_trunc("day", col("ts"))).as("day"))
        .agg((sum(col("value").cast(M)) * 1000).cast("decimal(18,0)")
          .cast("long").as("mills"))
        .select(col("event_type"), col("day"), col("mills"),
          count(lit(1)).over(w).as("n7"),
          sum("mills").over(w).as("s7"),
          // widen BEFORE the square: mills² wraps silently past ~3e9
          // daily mills in 64-bit (DuckDB's BIGINT multiply would RAISE
          // instead — a silent/loud divergence); s7 itself is safe
          // (≤ 7·10¹⁸, bounded by the DECIMAL(18) source type)
          sum(col("mills").cast("decimal(38,0)") * col("mills")).over(w).as("ss7"))
        .select(col("event_type"), col("day"), col("mills"),
          // s7² reaches ~5e19 — past BIGINT. Both engines take the
          // comparison through exact wide integers (decimal(38,0) here,
          // HUGEINT in the oracle); no value past ~1e21 can occur
          when(col("n7") === 7, {
            val mD = col("mills").cast("decimal(38,0)")
            val sD = col("s7").cast("decimal(38,0)")
            val ssD = col("ss7").cast("decimal(38,0)")
            val d1 = lit(7) * mD - sD
            when(d1 * d1 > lit(4) * (lit(7) * ssD - sD * sD), 1).otherwise(0)
          }).otherwise(lit(null).cast("int")).as("is_anomaly"))
        .orderBy("event_type", "day")
    },

    // ---- q_incr_agg: incremental aggregate maintenance. The merged
    //      result of partial aggregates over base (< $IncrCutoff) and
    //      delta (>= $IncrCutoff) must EQUAL the full recompute — the
    //      oracle IS the full recompute, so the gate proves the merge
    //      algebra (n, Σ in DECIMAL are mergeable; avg derives from them,
    //      never averaged across partials). 100 TB: yesterday's base
    //      partials are a stored table; only the delta is scanned, and
    //      the merge shuffles |keys| partial rows, not data rows ----
    "q_incr_agg" -> QueryDef(
      s"""SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  COUNT(*) AS n,
        |  CAST(round(SUM(CAST(value AS DECIMAL(18,3))), 2) AS DOUBLE)
        |    AS sum_value,
        |  CAST(round(SUM(CAST(value AS DECIMAL(18,3))), 2) AS DOUBLE)
        |    / COUNT(*) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, d) =>
      val cutoff = to_timestamp(lit(s"$IncrCutoff 00:00:00"))
      def partial(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("event_type"), to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(lit(1)).as("pn"), sum(col("value").cast(M)).as("psum"))
      val ev = Tables.events(spark, d)
      val base = partial(ev.filter(col("ts") < cutoff))
      val delta = partial(ev.filter(col("ts") >= cutoff))
      base.unionAll(delta)
        .groupBy("event_type", "day")
        .agg(sum("pn").as("n"), sum("psum").as("s"))
        .select(col("event_type"), col("day"), col("n"),
          round(col("s"), 2).cast("double").as("sum_value"),
          (round(col("s"), 2).cast("double") / col("n")).as("avg_value"))
        .orderBy("event_type", "day")
    })
}
