package graft.rel

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-log analytics: JSON extraction, event-time windowed aggregation,
  * and sessionization (SURVEY.md §2.8 gap + §2.9).
  *
  * The reference is purely offline (SURVEY.md §2.9), but the driver's
  * `events` table (event_id, ts, user_id, event_type, value, props JSON)
  * exercises the event-time surface. These run in *batch*; the identical
  * `groupBy(window(...))` plans run unchanged under Structured Streaming
  * (see graft.streaming.EventsStream for the streaming wiring +
  * watermarks).
  *
  * 100 TB notes: all aggregations shuffle once on their group keys; the
  * sessionize window partitions by user_id — the natural key a cluster
  * would also bucket the event log on. JSON extraction is a codegen'd
  * expression evaluated after scan pruning (only `props` is read for it).
  */
object EventQueries {

  private val M = DecimalType(18, 3)

  /** Exact integer floor division as a SQL fragment. `DIV` truncates
    * toward zero, so for negative epoch-micros (pre-1970 timestamps) a
    * value would land one bin too high and miss its probe bins; pmod's
    * non-negative remainder makes the quotient a true floor without the
    * double-rounding risk of FLOOR(x / y) on >2^53 microsecond values.
    */
  private def floorDiv(c: String, w: Long): String =
    s"(($c - pmod($c, ${w}L)) DIV ${w}L)"

  /** Per-user candidate bound for the capped interval join
    * (q_events_join_capped): only each user's `ActCap` most-recent
    * clicks (by (ts, event_id) desc — deterministic, oracle-replayable)
    * participate as join candidates, bounding the join intermediate at
    * |errors|·ActCap rows regardless of key skew. The registered value
    * is deliberately small enough to BITE at the correctness-gate scale
    * (sf0.01 tops out at ~22 clicks/user), so the oracle hash actually
    * exercises the capped path; a production deployment dials it to its
    * own per-entity activity percentile the way [[graft.ext.AssocQueries]]
    * justifies DEG_CAP.
    */
  val ActCap = 16

  /** The capped click-candidate relation: rank filter over a
    * user-partitioned (ts, event_id) desc order. `row_number <= K`
    * rewrites to WindowGroupLimit — partial per-partition top-K before
    * the user_id exchange, O(K) state per user, so a zipf hot user's
    * full click history is never materialized (PlanSpec asserts the
    * node). Exposed for the spec's hot-user invariants.
    */
  private[rel] def cappedClicks(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("c_us"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("c_us").desc, col("click_id").desc)))
      .filter(col("rn") <= ActCap).drop("rn")

  /** Stage list for q_events_funnel_n (4 stages exercises the general
    * path beyond the fixed 3-stage chain). Declared before `defs`, which
    * captures it at object init.
    */
  val FUNNEL_N_STAGES: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** The chained per-user funnel minima (s: first signup, c: first click
    * after it, p: first purchase after that), Memo-shared (r15, the
    * q_candidates memoization rule): q_events_funnel and q_funnel_latency
    * consume the IDENTICAL three relations, and within one query each
    * relation is referenced 2-3 times — uncached, the optimizer re-plans
    * the whole events scan + filter + aggregate chain per reference
    * (8+ exchanges, ~11 AQE stage jobs at sf0.1, a ~1s scheduling floor
    * on a 3-row answer; an attempted shared user_id repartition did NOT
    * collapse them — the per-type filters push below the exchange, so
    * the subtrees stay distinct). Each relation is ≤ one row per
    * converting user — far below any interaction relation the registry
    * already holds.
    */
  private def funnelStageMins(spark: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val ev = Tables.events(spark, d)
    def stage(t: String) = ev.filter(col("event_type") === t)
    val s = graft.Memo.cached(spark, d, "events.funnelS") {
      stage("signup").groupBy("user_id").agg(min(col("ts")).as("t1"))
        .persist()
    }
    val c = graft.Memo.cached(spark, d, "events.funnelC") {
      stage("click").join(s, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
        .persist()
    }
    val p = graft.Memo.cached(spark, d, "events.funnelP") {
      stage("purchase").join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
        .persist()
    }
    (s, c, p)
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- JSON scalar extraction + aggregate per event type ----
    "q_events_json" -> QueryDef(
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  CAST(round(SUM(CAST(value AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (spark, d) =>
      val k = get_json_object(col("props"), "$.k").cast("long")
      Tables.events(spark, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(k).as("sum_k"), min(k).as("min_k"), max(k).as("max_k"),
          round(sum(col("value").cast(M)), 2).cast("double").as("sum_value"))
        .orderBy("event_type")
    },

    // ---- tumbling 1-hour event-time window ----
    "q_events_tumbling" -> QueryDef(
      """SELECT date_trunc('hour', ts) AS win_start,
        |  COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(round(SUM(CAST(value AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (spark, d) =>
      Tables.events(spark, d)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value").cast(M)), 2).cast("double").as("sum_value"))
        .select(col("w.start").as("win_start"), col("n"), col("n_users"), col("sum_value"))
        .orderBy("win_start")
    },

    // ---- hopping window: 1 hour length, 30 min slide ----
    "q_events_hopping" -> QueryDef(
      """SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
        |                      - off.o * 1800000000) AS win_start,
        |  COUNT(*) AS n,
        |  CAST(round(SUM(CAST(value AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN (VALUES (0), (1)) off(o)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (spark, d) =>
      Tables.events(spark, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(M)), 2).cast("double").as("sum_value"))
        .select(col("w.start").as("win_start"), col("n"), col("sum_value"))
        .orderBy("win_start")
    },

    // ---- sessionization: 30-min inactivity gap, per-user session stats ----
    // boundary rule + island construction single-sourced in SessionOps
    // (gap >= 30min starts a session, = Spark session_window semantics)
    "q_events_sessionize" -> QueryDef(
      s"""WITH ${SessionOps.duckSessionsCte}
        |SELECT user_id, COUNT(*) AS n_sessions,
        |       CAST(SUM(n_events) AS BIGINT) AS n_events,
        |       MAX(n_events) AS max_session_events
        |FROM sess GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (spark, d) =>
      SessionOps.sessions(spark, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"))
        .orderBy("user_id")
    },

    // ---- REAL Structured Streaming execution, oracle-verified: the
    //      watermarked tumbling aggregate runs as a streaming job
    //      (file source → stateful agg → memory sink, AvailableNow) and
    //      must produce the exact batch/DuckDB result ----
    "q_events_stream" -> QueryDef(
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(round(SUM(CAST(value AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (spark, d) =>
      val agg = graft.streaming.EventsStream.readEventsStream(spark, d)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(M)), 2).cast("double").as("sum_value"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"),
          col("sum_value"))
      graft.streaming.EventsStream.runBounded(agg, "q_events_stream_sink")
        .orderBy("win_start", "event_type")
    },

    // ---- streaming exact dedup: the ingest-dedup operator an
    //      at-least-once 100 TB pipeline needs. The source is DOUBLED
    //      (union of two scans — real duplicate rows), then watermarked
    //      dropDuplicates must collapse the stream back to exactly the
    //      batch relation: the oracle aggregates the SINGLE events table,
    //      so any missed or over-dropped duplicate breaks the hash.
    //      Dedup state is bounded by the watermark (ts in the dedup key),
    //      which is what keeps this runnable on an unbounded stream. ----
    "q_stream_dedup" -> QueryDef(
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(round(SUM(CAST(value AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (spark, d) =>
      val doubled = graft.streaming.EventsStream.readEventsStream(spark, d)
        .unionAll(graft.streaming.EventsStream.readEventsStream(spark, d))
      val agg = doubled
        .withWatermark("ts", "2 hours")
        .dropDuplicates("event_id", "ts")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(M)), 2).cast("double").as("sum_value"))
      graft.streaming.EventsStream.runBounded(agg, "q_stream_dedup_sink")
        .orderBy("event_type")
    },

    // ---- stream-stream interval join (REAL streaming run): purchases
    //      joined to same-user clicks from the preceding 24h, both sides
    //      watermarked so the join state is bounded — without the time
    //      range + watermarks a stream-stream join must buffer BOTH
    //      streams forever. Append mode (the only mode a stream-stream
    //      join supports); the oracle replays the identical contract as
    //      a batch self-join.
    //      Watermark sizing: the click side must tolerate clicks arriving
    //      AFTER the purchase that references them advances the clock —
    //      under multi-batch delivery (maxFilesPerTrigger, many files) a
    //      delay shorter than the 24h join range silently drops those
    //      clicks and diverges from the batch oracle. So the click delay
    //      is join range (24h) + disorder bound (2h) = 26h; the purchase
    //      side only needs the disorder bound. State stays bounded: Spark
    //      evicts click state at clickWatermark, purchase state at
    //      purchaseWatermark - 24h, both finite.
    "q_stream_join" -> QueryDef(
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 24 HOURS AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id""".stripMargin) { (spark, d) =>
      // OUTPUT-BUDGET refusal (r10): this query EMITS the pair relation,
      // which is Θ(purchases_u × clicks_u) per user — on a power-law
      // entity the output itself is billions of rows and NO engine
      // escapes Ω(output) (the zipf 100× hot user: 402k × ~13k in-window
      // = ~5×10⁹ rows; the r9 suite had to env-skip this query). A cheap
      // per-(user, 24h-bin) count bound (clicks in the purchase's bin +
      // the previous one cover the window) over-estimates true output by
      // ≤2×; past the budget the query refuses LOUDLY, naming the
      // registered bounded twin — the production behavior for an
      // ill-posed job, vs stalling a cluster until its disks fill. The
      // budget trips only when the TRUE output is beyond any sane sink
      // (uniform axes bound at ~10⁶; the gate scales at ~10³).
      val binUs = 24L * 3600 * 1000000
      val counts = Tables.events(spark, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"),
          expr(floorDiv("unix_micros(ts)", binUs)).as("bin"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("c"))
        .groupBy("user_id", "bin")
        .agg(sum(col("p")).as("np"), sum(col("c")).as("nc"))
      // both bound terms in ONE action (r14, guide §1.2/§2.4: the two
      // separate aggregates re-ran the scan+agg subtree three times and
      // paid two blocking driver round-trips; the left join keeps every
      // counts row exactly once — prev-bin rows are unique per
      // (user_id, bin) — so sum(np·nc) is unchanged and sum(np·nc_prev)
      // over the left join equals the old inner-join sum, nulls ignored).
      // null guard: sum over zero rows is NULL (an events table with no
      // clicks/purchases must run, not NPE)
      val boundRow = counts
        .join(counts.select(col("user_id"), (col("bin") + 1).as("bin"),
          col("nc").as("nc_prev")), Seq("user_id", "bin"), "left")
        .agg(sum(col("np") * col("nc")), sum(col("np") * col("nc_prev")))
        .head()
      val bound = (if (boundRow.isNullAt(0)) 0L else boundRow.getLong(0)) +
        (if (boundRow.isNullAt(1)) 0L else boundRow.getLong(1))
      val budget = sys.env.get("SPARK_GRAFT_STREAM_JOIN_BUDGET")
        .map(_.toLong).getOrElse(100000000L)
      if (bound > budget)
        throw new graft.QueryRefusedException(
          s"q_stream_join output bound $bound rows exceeds budget $budget: " +
            "the pair relation is output-quadratic in a hot key's activity " +
            "(semantics, not plan) — use q_stream_join_capped, the " +
            "state-bounded twin, on power-law data")
      val es = graft.streaming.EventsStream
      val clicks = es.readEventsStream(spark, d)
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "26 hours")
      val purchases = es.readEventsStream(spark, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "2 hours")
      val joined = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 24 HOURS") &&
          col("click_ts") <= col("purchase_ts"))
        .select(col("purchase_id"), col("click_id"),
          (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
            .as("gap_us"))
      es.runBounded(joined, "q_stream_join_sink",
          mode = org.apache.spark.sql.streaming.OutputMode.Append())
        .orderBy("purchase_id", "click_id")
    },

    // ---- state-BOUNDED streaming interval join: q_stream_join's output
    //      is the pair relation itself — Θ(hot-key purchases × clicks),
    //      quadratic BY SEMANTICS on power-law entities, and Spark's
    //      stream-stream join re-scans the full per-key state list per
    //      arriving row, so the zipf 100× suite had to skip it. This is
    //      the production contract for the same question: per-key state
    //      holds only the ActCap most-recent clicks (a streaming state
    //      store's max-entries bound, the twin of q_events_join_capped),
    //      each purchase emits ONE aggregate row (n of its top-ActCap
    //      in-window clicks — exact min(cap, true n) — + gap to the most
    //      recent, always retained). State O(cap)/key, work O(cap)/row,
    //      output |purchases|: linear at any skew — the zipf suite runs
    //      it unskipped. Oracle replays the cap as a per-purchase
    //      row_number() <= cap over the uncapped join; see
    //      EventsStream.cappedIntervalJoin for the retention proof.
    "q_stream_join_capped" -> QueryDef(
      s"""WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'
        |), m AS (
        |  SELECT p.purchase_id, c.c_us,
        |    row_number() OVER (PARTITION BY p.purchase_id
        |                       ORDER BY c.c_us DESC, c.click_id DESC) AS rn
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.c_us <= p.p_us AND c.c_us >= p.p_us - 86400000000
        |)
        |SELECT p.purchase_id AS purchase_id, p.user_id,
        |       COUNT(m.rn) AS n_clicks,
        |       MIN(p.p_us - m.c_us) AS min_gap_us
        |FROM p LEFT JOIN m ON m.purchase_id = p.purchase_id AND m.rn <= $ActCap
        |GROUP BY p.purchase_id, p.user_id
        |ORDER BY p.purchase_id""".stripMargin) { (spark, d) =>
      import spark.implicits._
      val es = graft.streaming.EventsStream
      val typed = es.readEventsStream(spark, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), (col("event_type") === "purchase").as("is_purchase"))
        .as[graft.streaming.EventsStream.TypedEv]
      val joined = es.cappedIntervalJoin(typed, ActCap, 24L * 3600 * 1000000)
      es.runBounded(joined.toDF(), "q_stream_join_capped_sink",
          mode = org.apache.spark.sql.streaming.OutputMode.Append())
        .select(col("purchase_id"), col("user_id"), col("n_clicks"),
          col("min_gap_us"))
        .orderBy("purchase_id")
    },

    // ---- best-metric argmax selection (A7, main_my.py:302-320): the
    //      reference keeps the FIRST epoch that strictly improves each
    //      metric; row_number with (metric DESC, epoch ASC) reproduces
    //      that keep-first tie-break deterministically ----
    "q_best_epoch" -> QueryDef(
      """WITH series AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(round(SUM(CAST(value AS DECIMAL(18,3))), 2) AS DOUBLE) AS metric
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, day AS best_day, metric AS best_metric FROM (
        |  SELECT event_type, day, metric,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY metric DESC, day) AS rn
        |  FROM series)
        |WHERE rn = 1
        |ORDER BY event_type""".stripMargin) { (spark, d) =>
      import org.apache.spark.sql.expressions.Window
      val series = Tables.events(spark, d)
        .groupBy(col("event_type"), to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(round(sum(col("value").cast(M)), 2).cast("double").as("metric"))
      series
        .withColumn("rn", row_number().over(Window.partitionBy("event_type")
          .orderBy(col("metric").desc, col("day"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("day").as("best_day"),
          col("metric").as("best_metric"))
        .orderBy("event_type")
    },

    // ---- lag/lead analytics: inter-event gap distribution per event type ----
    "q_events_gaps" -> QueryDef(
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        |  FROM events
        |)
        |SELECT event_type, COUNT(gap_us) AS n_gaps,
        |       MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
        |       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(spark, d)
        .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(col("gap_us")).as("n_gaps"),
          min(col("gap_us")).as("min_gap_us"), max(col("gap_us")).as("max_gap_us"),
          sum(col("gap_us")).as("sum_gap_us"))
        .orderBy("event_type")
    },

    // ---- AS-OF join: attribute each purchase to the latest strictly-
    //      earlier click by the same user (order: (ts, event_id)).
    //      Spark has no ASOF JOIN operator; the naive reformulation is a
    //      per-row range join (quadratic per hot user). The scale shape
    //      used here is the single-pass merge: filter both event roles
    //      into ONE stream, ONE shuffle on user_id, and carry the last
    //      click forward with an ignoreNulls window over the strictly-
    //      preceding frame — O(n log n) in each user's events, no
    //      self-join. The oracle computes the same contract with an
    //      independent plan (per-purchase LATERAL argmax over clicks).
    "q_events_asof" -> QueryDef(
      """SELECT p.event_id AS purchase_id, p.user_id,
        |       c.click_id, c.gap_us
        |FROM events p LEFT JOIN LATERAL (
        |  SELECT c.event_id AS click_id,
        |         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |  FROM events c
        |  WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |    AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
        |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
        |) c ON TRUE
        |WHERE p.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin) { (spark, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(spark, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .withColumn("click_id",
          last(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(w))
        .withColumn("click_ts",
          last(when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
        .orderBy("purchase_id")
    },

    // ---- range (interval) join AGGREGATE: per error, the count of
    //      clicks within the following 24h and the gap to the first one.
    //      The r8 shape bin-bucketed the pair join (bin = window width),
    //      which bounds fan-out by per-user-per-DAY volume — but the
    //      joined intermediate is still Θ(errors_u × in-window clicks_u)
    //      per user, and on the zipf 100× tables (hot user = 20% of all
    //      events) that is ~10¹⁰ rows: the suite run never terminated.
    //      Because the OUTPUT is one aggregated row per error, the pair
    //      relation never needs to exist: the r9 shape is a sweep-line
    //      over the merged per-user stream. Each error injects three
    //      zero-weight probe rows — lo at t−1, hi at t+24h−1, at at t —
    //      and two incremental window passes answer everything:
    //        asc  RANGE(unbounded→current) running click count  →
    //             n_clicks = cum(hi) − cum(lo)  (cum-difference; RANGE
    //             peer semantics make both window bounds inclusive-exact
    //             on integer µs);
    //        desc RANGE(unbounded→current) running min click-µs →
    //             first click ≥ t, valid when < t+24h.
    //      Unbounded-preceding frames are add-only (no frame recompute),
    //      so cost is one user_id exchange + two per-partition sorts +
    //      a linear scan — linear per key at ANY skew, vs Ω(pairs) for
    //      every join formulation. The oracle keeps the plain inequality
    //      join, so the gate proves sweep ≡ join row-for-row.
    "q_events_range_join" -> QueryDef(
      """WITH e AS (
        |  SELECT event_id AS error_id, user_id, ts FROM events
        |  WHERE event_type = 'error'
        |), c AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        |)
        |SELECT e.error_id, e.user_id,
        |       COUNT(c.event_id) AS n_clicks,
        |       MIN(epoch_us(c.ts) - epoch_us(e.ts)) AS min_gap_us
        |FROM e LEFT JOIN c ON c.user_id = e.user_id
        |  AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 24 HOURS
        |GROUP BY e.error_id, e.user_id
        |ORDER BY error_id""".stripMargin) { (spark, d) =>
      val winUs = 24L * 3600 * 1000000
      val ev = Tables.events(spark, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          lit(1).as("is_click"), lit(null).cast("long").as("error_id"),
          lit(null).cast("long").as("e_us"), lit(null).cast("string").as("tag"))
      val probes = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("error_id"),
          unix_micros(col("ts")).as("e_us"))
        .select(col("user_id"), col("error_id"), col("e_us"),
          explode(array(
            struct((col("e_us") - 1).as("us"), lit("lo").as("tag")),
            struct((col("e_us") + winUs - 1).as("us"), lit("hi").as("tag")),
            struct(col("e_us").as("us"), lit("at").as("tag")))).as("pr"))
        .select(col("user_id"), col("pr.us").as("us"), lit(0).as("is_click"),
          col("error_id"), col("e_us"), col("pr.tag").as("tag"))
      val asc = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val desc = Window.partitionBy("user_id").orderBy(col("us").desc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(probes)
        // cum: clicks with us ≤ probe position (peers included by RANGE);
        // nxt: min click us ≥ probe position (desc direction)
        .withColumn("cum", sum(col("is_click")).over(asc))
        .withColumn("nxt",
          min(when(col("is_click") === 1, col("us"))).over(desc))
        .filter(col("error_id").isNotNull)
        .groupBy("error_id", "user_id", "e_us")
        .agg(max(when(col("tag") === "hi", col("cum"))).as("cum_hi"),
          max(when(col("tag") === "lo", col("cum"))).as("cum_lo"),
          max(when(col("tag") === "at", col("nxt"))).as("nxt"))
        .select(col("error_id"), col("user_id"),
          (col("cum_hi") - col("cum_lo")).as("n_clicks"),
          when(col("nxt") < col("e_us") + winUs, col("nxt") - col("e_us"))
            .as("min_gap_us"))
        .orderBy("error_id")
    },

    // ---- activity-capped interval join: the skew-safe formulation of
    //      q_events_range_join. A per-entity interval join's OUTPUT is
    //      Θ(errors_u × in-window clicks_u) per user — on a power-law
    //      entity holding 20% of all events the query semantics
    //      themselves are quadratic and NO engine escapes Ω(output)
    //      (measured: the uncapped form never terminates on the zipf
    //      100× tables, see SCALING.md). The production fix is a bound
    //      on per-entity state, exactly like a streaming state store's
    //      TTL/max-entries: only each user's [[ActCap]] most-recent
    //      clicks participate as join candidates. Every error still
    //      emits its output row (the probe side is the aggregate key —
    //      one row per error, linear by construction); the join
    //      intermediate is ≤ |errors|·ActCap rows, linear at any skew.
    //      The rank filter plans as WindowGroupLimit (partial per-
    //      partition top-K BEFORE the user shuffle, O(K) state per
    //      user — PlanSpec asserts it), so the hot user never even
    //      materializes its full click list. The oracle replays the
    //      identical cap via QUALIFY row_number().
    "q_events_join_capped" -> QueryDef(
      s"""WITH e AS (
        |  SELECT event_id AS error_id, user_id, ts FROM events
        |  WHERE event_type = 'error'
        |), c AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |                             ORDER BY ts DESC, event_id DESC) <= $ActCap
        |)
        |SELECT e.error_id, e.user_id,
        |       COUNT(c.event_id) AS n_clicks,
        |       MIN(epoch_us(c.ts) - epoch_us(e.ts)) AS min_gap_us
        |FROM e LEFT JOIN c ON c.user_id = e.user_id
        |  AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 24 HOURS
        |GROUP BY e.error_id, e.user_id
        |ORDER BY error_id""".stripMargin) { (spark, d) =>
      val winUs = 24L * 3600 * 1000000
      val ev = Tables.events(spark, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          unix_micros(col("ts")).as("e_us"))
      val clicks = cappedClicks(ev)
        .withColumn("bin", expr(floorDiv("c_us", winUs)))
      val probes = errors.withColumn("bin",
        explode(array(expr(floorDiv("e_us", winUs)),
          expr(floorDiv("e_us", winUs)) + 1)))
      val matches = probes.join(clicks, Seq("user_id", "bin"))
        .filter(col("c_us") >= col("e_us") && col("c_us") < col("e_us") + winUs)
        .groupBy("error_id")
        .agg(count(lit(1)).as("n_clicks"),
          min(col("c_us") - col("e_us")).as("min_gap_us"))
      errors.select("error_id", "user_id")
        .join(matches, Seq("error_id"), "left")
        .select(col("error_id"), col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"), col("min_gap_us"))
        .orderBy("error_id")
    },

    // ---- q_attribution: multi-touch marketing attribution — each
    //      purchase's value splits LINEARLY across the user's clicks in
    //      the trailing 24h (campaign = click's props.k % 4, a synthetic
    //      campaign id), with LAST-TOUCH attribution emitted beside it
    //      (the two standard models, comparable per campaign) and a
    //      campaign −1 bucket for unattributed purchases so value is
    //      conserved. Per-purchase credit is fixed-pointed ONCE via a
    //      non-negative integer floor division ((v_m·c_n·1e6) div n —
    //      Spark DIV = DuckDB // on non-negative operands), so campaign
    //      totals are exact BIGINT sums — never an order-dependent float
    //      accumulation. Last-touch pick = max on (c_us, −click_id):
    //      deterministic tiebreak.
    //      Plan (r9): the match relation is Θ(purchases·clicks) per hot
    //      user — the r8 bin-bucket join spilled the zipf 100× suite to
    //      disk-full — but every downstream consumer is a per-purchase
    //      AGGREGATE of it, so the q_events_range_join sweep-line applies:
    //      each purchase injects probe rows at p_us−1 (hi) and
    //      p_us−24h−1 (lo) into the merged per-user click stream, and ONE
    //      asc window pass computes add-only running counts (total + one
    //      per campaign — k ∈ {0..3} by construction, props.k is dense
    //      non-negative) plus a running max(struct(c_us, −click_id,
    //      campaign)) whose value at the hi probe IS the last-touch click
    //      (when n > 0 the latest click before p_us is necessarily
    //      in-window). n and per-campaign touches are cum-differences.
    //      Linear per key at any skew; the pair relation never exists.
    //      The oracle keeps the independent join plan, proving
    //      sweep ≡ join at the gate ----
    "q_attribution" -> QueryDef(
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us,
        |    CAST(round(value * 1000) AS BIGINT) AS v_m
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS campaign
        |  FROM events WHERE event_type = 'click'
        |), m AS (
        |  SELECT p.purchase_id, p.v_m, c.campaign, c.c_us, c.click_id
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.c_us < p.p_us AND c.c_us >= p.p_us - 86400000000
        |), per_p AS (
        |  SELECT purchase_id, COUNT(*) AS n FROM m GROUP BY purchase_id
        |), linear_credit AS (
        |  SELECT cnt.campaign,
        |    CAST(SUM((cnt.v_m * cnt.c_n * 1000000) // per_p.n) AS BIGINT) AS cr,
        |    CAST(SUM(cnt.c_n) AS BIGINT) AS touches
        |  FROM (SELECT purchase_id, campaign, MIN(v_m) AS v_m,
        |          COUNT(*) AS c_n
        |        FROM m GROUP BY purchase_id, campaign) cnt
        |  JOIN per_p ON per_p.purchase_id = cnt.purchase_id
        |  GROUP BY cnt.campaign
        |), last_t AS (
        |  SELECT campaign, CAST(SUM(v_m) AS BIGINT) AS lv FROM (
        |    SELECT purchase_id, v_m, campaign,
        |      row_number() OVER (PARTITION BY purchase_id
        |        ORDER BY c_us DESC, click_id) AS rn
        |    FROM m) WHERE rn = 1 GROUP BY campaign
        |), unattr AS (
        |  SELECT CAST(-1 AS BIGINT) AS campaign,
        |    CAST(0 AS BIGINT) AS touches,
        |    CAST(SUM(v_m * 1000000) AS BIGINT) AS cr,
        |    CAST(SUM(v_m) AS BIGINT) AS lv
        |  FROM p WHERE purchase_id NOT IN (SELECT purchase_id FROM m)
        |)
        |SELECT l.campaign, l.touches,
        |  round(CAST(l.cr AS DOUBLE) / 1e9, 6) AS linear_value,
        |  round(CAST(t.lv AS DOUBLE) / 1e3, 6) AS last_touch_value
        |FROM linear_credit l JOIN last_t t ON t.campaign = l.campaign
        |UNION ALL
        |SELECT campaign, touches, round(CAST(cr AS DOUBLE) / 1e9, 6),
        |  round(CAST(lv AS DOUBLE) / 1e3, 6)
        |FROM unattr WHERE lv IS NOT NULL
        |ORDER BY campaign""".stripMargin) { (spark, d) =>
      val winUs = 24L * 3600 * 1000000
      val ev = Tables.events(spark, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          lit(1).as("is_click"), col("event_id").as("click_id"),
          (get_json_object(col("props"), "$.k").cast("long") % 4)
            .as("campaign"),
          lit(null).cast("long").as("purchase_id"),
          lit(null).cast("long").as("p_us"),
          lit(null).cast("long").as("v_m"),
          lit(null).cast("string").as("tag"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("v_m"))
        .select(col("user_id"), col("purchase_id"), col("p_us"), col("v_m"),
          explode(array(
            struct((col("p_us") - 1).as("us"), lit("hi").as("tag")),
            struct((col("p_us") - winUs - 1).as("us"), lit("lo").as("tag"))))
            .as("pr"))
        .select(col("user_id"), col("pr.us").as("us"), lit(0).as("is_click"),
          lit(null).cast("long").as("click_id"),
          lit(null).cast("long").as("campaign"),
          col("purchase_id"), col("p_us"), col("v_m"), col("pr.tag").as("tag"))
      val asc = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      def cumK(k: Int) = sum(when(col("is_click") === 1
        && col("campaign") === k, 1).otherwise(0)).over(asc)
      // per purchase: n and per-campaign touches as cum-differences,
      // last-touch click as the hi-probe running max (ties: max c_us
      // then MIN click_id, via the negated field)
      val perP = clicks.unionByName(probes)
        .withColumn("cum", sum(col("is_click")).over(asc))
        .withColumn("cum0", cumK(0)).withColumn("cum1", cumK(1))
        .withColumn("cum2", cumK(2)).withColumn("cum3", cumK(3))
        .withColumn("lastc", max(when(col("is_click") === 1,
          struct(col("us").as("c_us"), (-col("click_id")).as("neg"),
            col("campaign").as("campaign")))).over(asc))
        .filter(col("purchase_id").isNotNull)
        .groupBy("purchase_id", "p_us", "v_m")
        .agg(
          (max(when(col("tag") === "hi", col("cum")))
            - max(when(col("tag") === "lo", col("cum")))).as("n"),
          (max(when(col("tag") === "hi", col("cum0")))
            - max(when(col("tag") === "lo", col("cum0")))).as("n0"),
          (max(when(col("tag") === "hi", col("cum1")))
            - max(when(col("tag") === "lo", col("cum1")))).as("n1"),
          (max(when(col("tag") === "hi", col("cum2")))
            - max(when(col("tag") === "lo", col("cum2")))).as("n2"),
          (max(when(col("tag") === "hi", col("cum3")))
            - max(when(col("tag") === "lo", col("cum3")))).as("n3"),
          max(when(col("tag") === "hi", col("lastc"))).as("lastc"))
        .localCheckpoint() // three consumers read the per-purchase relation
      val attributed = perP.filter(col("n") > 0)
      val linear = attributed
        .select(col("v_m"), col("n"), explode(array((0 to 3).map(k =>
          struct(lit(k.toLong).as("campaign"), col(s"n$k").as("c_n"))): _*))
          .as("t"))
        .select(col("v_m"), col("n"), col("t.campaign").as("campaign"),
          col("t.c_n").as("c_n"))
        .filter(col("c_n") > 0)
        .groupBy("campaign")
        .agg(sum(expr("(v_m * c_n * 1000000) DIV n")).cast("long").as("cr"),
          sum("c_n").cast("long").as("touches"))
      val lastT = attributed
        .groupBy(col("lastc.campaign").as("campaign"))
        .agg(sum("v_m").cast("long").as("lv"))
      val unattr = perP.filter(col("n") === 0)
        .agg(sum(col("v_m") * 1000000L).cast("long").as("cr"),
          sum("v_m").cast("long").as("lv"))
        .select(lit(-1L).as("campaign"), lit(0L).as("touches"),
          col("cr"), col("lv"))
        .filter(col("lv").isNotNull)
      linear.join(lastT, "campaign")
        .select(col("campaign"), col("touches"), col("cr"), col("lv"))
        .unionAll(unattr.select("campaign", "touches", "cr", "lv"))
        .select(col("campaign"), col("touches"),
          round(col("cr").cast("double") / 1e9, 6).as("linear_value"),
          round(col("lv").cast("double") / 1e3, 6).as("last_touch_value"))
        .orderBy("campaign")
    },

    // ---- funnel analysis: ordered signup → click → purchase
    //      progression per user (each stage's earliest event STRICTLY
    //      after the previous stage's). Three aggregates chained by
    //      equi-joins — every shuffle keys on user_id, so a cluster
    //      co-partitions the whole chain (one real exchange, reused);
    //      no per-user sort, no event self-join on time. At 3 fixed
    //      stages the join chain keeps the whole plan in codegen'd hash
    //      aggregates; the arbitrary-length form is [[funnelStages]]
    //      (q_events_funnel_n), spec-proven value-equal to this chain at
    //      3 stages (FunnelSpec).
    "q_events_funnel" -> QueryDef(
      """WITH s AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN s ON s.user_id = e.user_id AND e.ts > s.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
        |)
        |SELECT (SELECT COUNT(*) FROM s) AS n_signup,
        |       (SELECT COUNT(*) FROM c) AS n_click_after,
        |       (SELECT COUNT(*) FROM p) AS n_purchase_after,
        |       (SELECT CAST(SUM(epoch_us(p.t3) - epoch_us(s.t1)) AS BIGINT)
        |        FROM p JOIN s ON s.user_id = p.user_id) AS sum_funnel_us""".stripMargin) {
      (spark, d) =>
      val (s, c, p) = funnelStageMins(spark, d)
      s.agg(count(lit(1)).as("n_signup"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after")))
        .crossJoin(p.join(s, "user_id")
          .agg(sum(unix_micros(col("t3")) - unix_micros(col("t1")))
            .as("sum_funnel_us")))
    },

    // ---- q_funnel_latency: time-to-convert percentiles per funnel leg
    //      — the question after q_events_funnel's "how many convert" is
    //      "how fast". Latencies are exact integer microseconds from
    //      the same chained-MIN stage relations; p50/p90 are exact
    //      ceil-rank order statistics (the q_outliers machinery) over
    //      per-LEG partitions — the rank sort runs on converting users
    //      only (orders of magnitude below event volume), so the
    //      exact-percentile price is honest at any scale ----
    "q_funnel_latency" -> QueryDef(
      """WITH s AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN s ON s.user_id = e.user_id AND e.ts > s.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
        |), lat AS (
        |  SELECT 'signup_click' AS leg,
        |    epoch_us(c.t2) - epoch_us(s.t1) AS us
        |  FROM c JOIN s USING (user_id)
        |  UNION ALL
        |  SELECT 'click_purchase', epoch_us(p.t3) - epoch_us(c.t2)
        |  FROM p JOIN c USING (user_id)
        |  UNION ALL
        |  SELECT 'signup_purchase', epoch_us(p.t3) - epoch_us(s.t1)
        |  FROM p JOIN s USING (user_id)
        |), r AS (
        |  SELECT leg, us,
        |    row_number() OVER (PARTITION BY leg ORDER BY us) AS rn,
        |    COUNT(*) OVER (PARTITION BY leg) AS n
        |  FROM lat
        |)
        |SELECT leg, MAX(n) AS n,
        |  MAX(CASE WHEN rn <= (n + 1) // 2 THEN us END) AS p50_us,
        |  MAX(CASE WHEN rn <= (9 * n + 9) // 10 THEN us END) AS p90_us
        |FROM r GROUP BY leg ORDER BY leg""".stripMargin) { (spark, d) =>
      val (s, c, p) = funnelStageMins(spark, d)
      val lat = c.join(s, "user_id")
        .select(lit("signup_click").as("leg"),
          (unix_micros(col("t2")) - unix_micros(col("t1"))).as("us"))
        .unionAll(p.join(c, "user_id")
          .select(lit("click_purchase").as("leg"),
            (unix_micros(col("t3")) - unix_micros(col("t2"))).as("us")))
        .unionAll(p.join(s, "user_id")
          .select(lit("signup_purchase").as("leg"),
            (unix_micros(col("t3")) - unix_micros(col("t1"))).as("us")))
      val byLeg = org.apache.spark.sql.expressions.Window.partitionBy("leg")
      lat
        .withColumn("rn", row_number().over(byLeg.orderBy("us")))
        .withColumn("n", count(lit(1)).over(byLeg))
        .groupBy("leg")
        .agg(max(col("n")).as("n"),
          max(when(col("rn") <= expr("(n + 1) DIV 2"), col("us"))).as("p50_us"),
          max(when(col("rn") <= expr("(9 * n + 9) DIV 10"), col("us")))
            .as("p90_us"))
        .orderBy("leg")
    },

    // ---- arbitrary-length funnel: the generalized operator. One
    //      user_id shuffle + one per-group SORTED pass (flatMapSortedGroups
    //      — Spark sorts within groups during the shuffle, state per
    //      group is O(stages), never the event list), versus the 3-stage
    //      chain's N shuffled aggregates. Per stage: users reaching it
    //      and total time-from-funnel-start. This is the form an N-stage
    //      product funnel runs at 100 TB: adding a stage is a constant,
    //      not a new join. ----
    "q_events_funnel_n" -> QueryDef(
      duckFunnelSql(FUNNEL_N_STAGES)) { (spark, d) =>
      funnelStages(spark, d, FUNNEL_N_STAGES)
    })

  /** Arbitrary-stage funnel: per stage, the number of users whose
    * greedy earliest-strictly-after chain reaches it, and the summed gap
    * from each user's funnel start to that stage's hit. Greedy
    * earliest-match over the time-sorted stream is exactly the chained
    * MIN(ts>prev) semantics of the 3-stage join form (FunnelSpec proves
    * value equality at 3 stages).
    */
  def funnelStages(spark: org.apache.spark.sql.SparkSession, d: String,
      stages: Seq[String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val stageArr = stages.toArray
    val hits = Tables.events(spark, d)
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ts_us"), col("event_type")) { (uid, it) =>
        val times = new Array[Long](stageArr.length)
        var idx = 0
        var prev = Long.MinValue
        it.foreach { case (_, et, t) =>
          if (idx < stageArr.length && et == stageArr(idx) && t > prev) {
            times(idx) = t; prev = t; idx += 1
          }
        }
        (1 to idx).map(i =>
          (i.toLong, stageArr(i - 1), uid, times(i - 1) - times(0)))
      }
      .toDF("stage_idx", "stage", "user_id", "gap_us")
      .groupBy("stage_idx", "stage")
      .agg(count(lit(1)).as("n_users"), sum(col("gap_us")).as("sum_gap_us"))
    // a stage NO user reaches must still report (idx, stage, 0, 0): the
    // oracle's per-stage UNION ALL branch is an ungrouped aggregate that
    // always emits one row — a bare groupBy would silently drop the
    // stage and break row parity the moment a funnel dries up
    val allStages = stages.zipWithIndex
      .map { case (st, i) => ((i + 1).toLong, st) }
      .toDF("stage_idx", "stage")
    allStages.join(hits, Seq("stage_idx", "stage"), "left")
      .select(col("stage_idx"), col("stage"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        coalesce(col("sum_gap_us"), lit(0L)).as("sum_gap_us"))
      .orderBy("stage_idx")
  }

  /** DuckDB twin of [[funnelStages]]: the chained-MIN CTE form, generated
    * for any stage list.
    */
  def duckFunnelSql(stages: Seq[String]): String = {
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s1 AS (
           |  SELECT user_id, MIN(ts) AS t1 FROM events
           |  WHERE event_type = '$st' GROUP BY user_id
           |)""".stripMargin
      else
        s"""s${i + 1} AS (
           |  SELECT e.user_id, MIN(e.ts) AS t${i + 1} FROM events e
           |  JOIN s$i ON s$i.user_id = e.user_id AND e.ts > s$i.t$i
           |  WHERE e.event_type = '$st' GROUP BY e.user_id
           |)""".stripMargin
    }
    val selects = stages.zipWithIndex.map { case (st, i) =>
      val gap =
        if (i == 0) "CAST(0 AS BIGINT)"
        else s"CAST(SUM(epoch_us(s${i + 1}.t${i + 1}) - epoch_us(s1.t1)) AS BIGINT)"
      val from =
        if (i == 0) "FROM s1"
        else s"FROM s${i + 1} JOIN s1 ON s1.user_id = s${i + 1}.user_id"
      s"""SELECT CAST(${i + 1} AS BIGINT) AS stage_idx, '$st' AS stage,
         |  COUNT(*) AS n_users, coalesce($gap, 0) AS sum_gap_us $from""".stripMargin
    }
    s"WITH ${ctes.mkString(",\n")}\n${selects.mkString("\nUNION ALL\n")}" +
      "\nORDER BY stage_idx"
  }
}
