package graft.rel

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Warehouse-dimension and physical-layout operators: SCD Type-2 interval
  * construction, per-group closed-form regression, exact-rank IQR outlier
  * detection, and Z-order (Morton) multi-dimensional clustering.
  *
  * These round out the relational surface the way a production lakehouse
  * uses it: CDC upsert (q_merge_upsert) keeps the LATEST row; SCD2 here
  * keeps the full validity history. Column profiling (q_profile_stats)
  * describes distributions; the outlier query acts on them. Z-order is the
  * layout op that makes 100 TB scans skippable on TWO keys at once.
  *
  * Parity rules (QueryDef): money goes through DECIMAL(18,3) so sums are
  * exact and order-independent; the regression's six moments stay DECIMAL
  * until one final mirrored IEEE expression; quartiles are exact-rank
  * integers (no interpolation); the 1.5·IQR fence is integer-scaled ×4/×6
  * so no floats appear at all; Morton codes are pure bit arithmetic.
  */
object DimQueries {

  private val M = DecimalType(18, 3)
  private def dec(c: org.apache.spark.sql.Column) = c.cast(M)

  // ---- q_zorder: 10-bit × 10-bit Morton interleave ----
  /** Bits per dimension (1024-cell grid per key). */
  val ZBits = 10
  /** Bucket = top 6 interleaved bits ⇒ 64 buckets of 128×128 cells. */
  val ZBucketShift = 14

  private def sparkZ(px: String, sx: String): String =
    (0 until ZBits).map(i =>
      s"(shiftleft(shiftright($px, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($sx, $i) & 1, ${2 * i + 1}))").mkString(" + ")

  private def duckZ(px: String, sx: String): String =
    (0 until ZBits).map(i =>
      s"(((($px >> $i) & 1) << ${2 * i}) + " +
        s"((($sx >> $i) & 1) << ${2 * i + 1}))").mkString(" + ")

  val defs: Map[String, QueryDef] = Map(

    // ---- SCD Type-2 dimension build (the history-keeping complement of
    //      q_merge_upsert's keep-latest): collapse each user's event-type
    //      stream to change rows, then close each version's validity
    //      interval with the next change's timestamp. Open intervals carry
    //      valid_to = NULL (is_current flags them) — a far-future sentinel
    //      timestamp would be timezone/serialization-sensitive in clients.
    //      100 TB: ONE shuffle on user_id; the change-detect window and the
    //      interval windows share the same (user_id, ts, event_id) sort
    //      order, and the second pass runs over the already-partitioned
    //      (much smaller) changes-only relation — DimSpec asserts the
    //      single Exchange ----
    "q_scd2" -> QueryDef(
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), changes AS (
        |  SELECT user_id, event_type, ts, event_id FROM ordered
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS BIGINT) AS version,
        |  CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM changes
        |ORDER BY user_id, version""".stripMargin) { (spark, d) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val changes = Tables.events(spark, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select("user_id", "event_type", "ts", "event_id")
      changes
        .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
        .withColumn("version", row_number().over(byUser).cast("long"))
        .withColumn("is_current",
          when(lead(col("ts"), 1).over(byUser).isNull, 1).otherwise(0))
        .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
          col("valid_to"), col("version"), col("is_current"))
        .orderBy("user_id", "version")
    },

    // ---- point-in-time lookup against the SCD2 dimension (the join
    //      q_scd2's intervals exist to serve): attribute every purchase
    //      event to the user-state version active at its timestamp.
    //      Each purchase matches EXACTLY ONE half-open interval
    //      [valid_from, valid_to), so the relational equi-join + range
    //      residual (r8 shape) pays a Θ(purchases_u · versions_u)
    //      intermediate for a 1-row answer — on the zipf 100× tables
    //      the hot user made that one SMJ task run 208s single-threaded.
    //      The r9 shape is the as-of merge (same pattern as
    //      q_events_asof): ONE user_id shuffle over the unioned stream,
    //      carry the prevailing non-purchase state forward with an
    //      ignoreNulls window (non-purchases sort before purchases at
    //      equal ts, matching p.ts >= valid_from; the LAST change at a
    //      tied ts wins, matching the empty [t,t) interval), then one
    //      hash aggregate. Linear per key at any skew; purchases before
    //      any state (NULL carry) drop exactly like the inner join
    //      dropped them. Revenue stays DECIMAL to the one rounded cast.
    //      The dimension tracks the NON-purchase stream (a purchase
    //      would otherwise open its own interval and every lookup would
    //      self-attribute); consecutive same-type events collapse into
    //      one interval, which the carry-forward reproduces for free —
    //      the prevailing type IS the deduped interval's state. Oracle
    //      keeps the independent interval-join plan ----
    "q_scd2_lookup" -> QueryDef(
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |  WHERE event_type <> 'purchase'
        |), changes AS (
        |  SELECT user_id, event_type, ts, event_id FROM ordered
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |), dim AS (
        |  SELECT user_id, event_type AS state, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM changes
        |)
        |SELECT d.state, COUNT(*) AS n_purchases,
        |  CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users,
        |  CAST(round(SUM(CAST(p.value AS DECIMAL(18,3))), 2) AS DOUBLE) AS total_value
        |FROM events p
        |JOIN dim d ON d.user_id = p.user_id
        |  AND p.ts >= d.valid_from
        |  AND (d.valid_to IS NULL OR p.ts < d.valid_to)
        |WHERE p.event_type = 'purchase'
        |GROUP BY d.state
        |ORDER BY d.state""".stripMargin) { (spark, d) =>
      val isP = col("event_type") === "purchase"
      // non-purchases first at a tied ts (change at t owns [t, ...)),
      // event_id last so the latest tied change wins the carry-forward
      val merge = Window.partitionBy("user_id")
        .orderBy(col("ts"), isP.cast("int"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(spark, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
        .withColumn("state",
          last(when(!isP, col("event_type")), ignoreNulls = true).over(merge))
        .filter(isP && col("state").isNotNull)
        .groupBy("state")
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(dec(col("value"))), 2).cast("double").as("total_value"))
        .orderBy("state")
    },

    // ---- per-group closed-form OLS (extendedprice ~ quantity): the six
    //      moments (n, Σx, Σy, Σxx, Σyy, Σxy) accumulate EXACTLY in
    //      DECIMAL — order-independent, map-side combinable, one shuffle
    //      of 6 numbers per group — then slope/intercept/r² are ONE
    //      mirrored IEEE expression over the exact moments. This is the
    //      distributed-regression shape (statistics, not rows, move) ----
    "q_group_regr" -> QueryDef(
      """WITH m AS (
        |  SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,3))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,3))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,3))
        |      * CAST(l_quantity AS DECIMAL(18,3))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,3))
        |      * CAST(l_extendedprice AS DECIMAL(18,3))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,3))
        |      * CAST(l_extendedprice AS DECIMAL(18,3))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
        |  round((CAST(sy AS DOUBLE)
        |         - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |           * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
        |  round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
        |      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        |FROM m ORDER BY l_returnflag""".stripMargin) { (spark, d) =>
      val qd = dec(col("l_quantity"))
      val pd = dec(col("l_extendedprice"))
      val m = Tables.lineitem(spark, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(qd).as("sx"), sum(pd).as("sy"),
          sum(qd * qd).as("sxx"), sum(pd * pd).as("syy"), sum(qd * pd).as("sxy"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double")
      val sy = col("sy").cast("double")
      val sxx = col("sxx").cast("double")
      val syy = col("syy").cast("double")
      val sxy = col("sxy").cast("double")
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      m.select(col("l_returnflag"), col("n"),
          round(num / den, 6).as("slope"),
          round((sy - (num / den) * sx) / n, 6).as("intercept"),
          round((num * num) / (den * (n * syy - sy * sy)), 6).as("r2"))
        .orderBy("l_returnflag")
    },

    // ---- exact-rank IQR outlier fences per group: quartiles at ceil-rank
    //      positions (no interpolation, pure integers), 1.5·IQR fence
    //      integer-scaled (×4 / ×6) so the whole query is float-free.
    //      100 TB: the per-group sort is the exact-quantile price — the
    //      production dial is q_approx_quantiles' mergeable sketch; this
    //      is the correctness anchor. Bounds (3 rows) broadcast back ----
    // ---- q_winsorized: winsorized (P5/P95-clamped) robust mean per
    //      group — the outlier-resistant aggregate reported beside the
    //      raw mean when heavy tails would swamp it (the clamping twin
    //      of q_outliers' fence REPORT: there the tails are counted,
    //      here they are pulled in). Fences are exact ceil-rank order
    //      statistics (pure integers, q_outliers' machinery); clamped
    //      values stay integer cents so both means are exact BIGINT
    //      sums to one final mirrored division. The per-group sort is
    //      the exact-quantile price; q_approx_quantiles is the dial ----
    "q_winsorized" -> QueryDef(
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,3)) * 100 AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(18,3)) * 100 AS BIGINT),
        |               l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem
        |), q AS (
        |  SELECT l_returnflag, MAX(n) AS n,
        |    MAX(CASE WHEN rn <= (n + 19) // 20 THEN cents END) AS p5_cents,
        |    MAX(CASE WHEN rn <= (19 * n + 19) // 20 THEN cents END) AS p95_cents
        |  FROM c GROUP BY l_returnflag
        |)
        |SELECT c.l_returnflag, MAX(q.n) AS n,
        |  MAX(q.p5_cents) AS p5_cents, MAX(q.p95_cents) AS p95_cents,
        |  round(CAST(SUM(c.cents) AS DOUBLE) / MAX(q.n) / 100.0, 6) AS mean_raw,
        |  round(CAST(SUM(least(greatest(c.cents, q.p5_cents), q.p95_cents))
        |      AS DOUBLE) / MAX(q.n) / 100.0, 6) AS mean_winsor
        |FROM c JOIN q ON q.l_returnflag = c.l_returnflag
        |GROUP BY c.l_returnflag
        |ORDER BY c.l_returnflag""".stripMargin) { (spark, d) =>
      val cents = (dec(col("l_extendedprice")) * 100).cast("long")
      val byFlag = Window.partitionBy("l_returnflag")
      val c = Tables.lineitem(spark, d)
        .select(col("l_returnflag"), cents.as("cents"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(
          byFlag.orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))))
        .withColumn("n", count(lit(1)).over(byFlag))
      val q = c.groupBy("l_returnflag").agg(
        max(col("n")).as("n"),
        max(when(col("rn") <= expr("(n + 19) DIV 20"), col("cents")))
          .as("p5_cents"),
        max(when(col("rn") <= expr("(19 * n + 19) DIV 20"), col("cents")))
          .as("p95_cents"))
      c.select("l_returnflag", "cents").join(broadcast(q), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n"),
          max(col("p5_cents")).as("p5_cents"),
          max(col("p95_cents")).as("p95_cents"),
          round(sum(col("cents")).cast("double") / max(col("n")) / 100.0, 6)
            .as("mean_raw"),
          round(sum(least(greatest(col("cents"), col("p5_cents")),
              col("p95_cents"))).cast("double") / max(col("n")) / 100.0, 6)
            .as("mean_winsor"))
        .orderBy("l_returnflag")
    },

    "q_outliers" -> QueryDef(
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,3)) * 100 AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(18,3)) * 100 AS BIGINT),
        |               l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem
        |), q AS (
        |  SELECT l_returnflag, MAX(n) AS n,
        |    MAX(CASE WHEN rn <= (n + 3) // 4 THEN cents END) AS q1_cents,
        |    MAX(CASE WHEN rn <= (3 * n + 3) // 4 THEN cents END) AS q3_cents
        |  FROM c GROUP BY l_returnflag
        |)
        |SELECT c.l_returnflag, MAX(q.n) AS n,
        |  MAX(q.q1_cents) AS q1_cents, MAX(q.q3_cents) AS q3_cents,
        |  CAST(SUM(CASE WHEN 4 * c.cents > 4 * q.q3_cents + 6 * (q.q3_cents - q.q1_cents)
        |      OR 4 * c.cents < 4 * q.q1_cents - 6 * (q.q3_cents - q.q1_cents)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
        |  round(CAST(SUM(CASE WHEN 4 * c.cents > 4 * q.q3_cents + 6 * (q.q3_cents - q.q1_cents)
        |      OR 4 * c.cents < 4 * q.q1_cents - 6 * (q.q3_cents - q.q1_cents)
        |    THEN 1 ELSE 0 END) AS DOUBLE) / MAX(q.n), 6) AS out_ratio
        |FROM c JOIN q ON q.l_returnflag = c.l_returnflag
        |GROUP BY c.l_returnflag
        |ORDER BY c.l_returnflag""".stripMargin) { (spark, d) =>
      val cents = (dec(col("l_extendedprice")) * 100).cast("long")
      val byFlag = Window.partitionBy("l_returnflag")
      val c = Tables.lineitem(spark, d)
        .select(col("l_returnflag"), cents.as("cents"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(
          byFlag.orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))))
        .withColumn("n", count(lit(1)).over(byFlag))
      val q = c.groupBy("l_returnflag").agg(
        max(col("n")).as("n"),
        max(when(col("rn") <= expr("(n + 3) DIV 4"), col("cents"))).as("q1_cents"),
        max(when(col("rn") <= expr("(3 * n + 3) DIV 4"), col("cents"))).as("q3_cents"))
      val iqr = col("q3_cents") - col("q1_cents")
      val isOut = (lit(4) * col("cents") > lit(4) * col("q3_cents") + lit(6) * iqr) ||
        (lit(4) * col("cents") < lit(4) * col("q1_cents") - lit(6) * iqr)
      c.select("l_returnflag", "cents").join(broadcast(q), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n"),
          max(col("q1_cents")).as("q1_cents"), max(col("q3_cents")).as("q3_cents"),
          sum(when(isOut, 1).otherwise(0)).cast("long").as("n_out"),
          round(sum(when(isOut, 1).otherwise(0)).cast("double") / max(col("n")), 6)
            .as("out_ratio"))
        .orderBy("l_returnflag")
    },

    // ---- pivot (long→wide): quarterly revenue matrix per returnflag via
    //      Spark's native relational pivot. With explicit pivot values
    //      the plan is ONE hash aggregate with conditional partials —
    //      map-side combinable, no extra shuffle vs a plain groupBy, and
    //      no second pass to discover the column set (the implicit-values
    //      form needs a distinct scan first — that is the form to avoid
    //      at 100 TB). DECIMAL sums keep each cell exact ----
    "q_pivot" -> QueryDef(
      """SELECT l_returnflag,
        |  CAST(round(SUM(CASE WHEN quarter(l_shipdate) = 1
        |    THEN CAST(l_extendedprice AS DECIMAL(18,3)) END), 2) AS DOUBLE) AS q1_rev,
        |  CAST(round(SUM(CASE WHEN quarter(l_shipdate) = 2
        |    THEN CAST(l_extendedprice AS DECIMAL(18,3)) END), 2) AS DOUBLE) AS q2_rev,
        |  CAST(round(SUM(CASE WHEN quarter(l_shipdate) = 3
        |    THEN CAST(l_extendedprice AS DECIMAL(18,3)) END), 2) AS DOUBLE) AS q3_rev,
        |  CAST(round(SUM(CASE WHEN quarter(l_shipdate) = 4
        |    THEN CAST(l_extendedprice AS DECIMAL(18,3)) END), 2) AS DOUBLE) AS q4_rev
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, d) =>
      Tables.lineitem(spark, d)
        .select(col("l_returnflag"), quarter(col("l_shipdate")).as("q"),
          dec(col("l_extendedprice")).as("p"))
        .groupBy("l_returnflag")
        .pivot("q", Seq(1, 2, 3, 4))
        .agg(round(sum(col("p")), 2).cast("double"))
        .withColumnsRenamed(Map(
          "1" -> "q1_rev", "2" -> "q2_rev", "3" -> "q3_rev", "4" -> "q4_rev"))
        .orderBy("l_returnflag")
    },

    // ---- Z-order (Morton) clustering: interleave the low 10 bits of
    //      partkey and suppkey so ONE sort key clusters BOTH dimensions;
    //      a 100 TB table laid out by z-ranges serves part-keyed AND
    //      supplier-keyed scans from narrow file ranges (per-bucket
    //      min/max below are the skipping proof: each 1/64 bucket spans
    //      ≤1/8 of EACH key's domain — DimSpec asserts it; a 1-D sort
    //      spans the full second domain). Pure bit arithmetic, no UDF ----
    "q_zorder" -> QueryDef(
      s"""WITH keyed AS (
         |  SELECT l_partkey % 1024 AS px, l_suppkey % 1024 AS sx FROM lineitem
         |), z AS (
         |  SELECT px, sx, ${duckZ("px", "sx")} AS zval FROM keyed
         |)
         |SELECT zval >> $ZBucketShift AS z_bucket,
         |  COUNT(*) AS cnt,
         |  MIN(px) AS min_p, MAX(px) AS max_p,
         |  MIN(sx) AS min_s, MAX(sx) AS max_s
         |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin) { (spark, d) =>
      Tables.lineitem(spark, d)
        .select((col("l_partkey") % 1024).as("px"), (col("l_suppkey") % 1024).as("sx"))
        .withColumn("zval", expr(sparkZ("px", "sx")))
        .groupBy(expr(s"shiftright(zval, $ZBucketShift)").as("z_bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("px")).as("min_p"), max(col("px")).as("max_p"),
          min(col("sx")).as("min_s"), max(col("sx")).as("max_s"))
        .orderBy("z_bucket")
    })
}
