package graft.rel

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational breadth over the TPC-H-ish star schema (SURVEY.md §7 P2).
  *
  * The reference has no relational joins — all correlation is dict lookup /
  * aligned indexing (SURVEY.md §2.3) — but a complete engine must cover the
  * star-schema surface the driver's tables exercise: scan → filter →
  * multi-way join → hash aggregate → sort/limit, plus set ops and scalar
  * functions. Everything here is declarative DataFrame API so Catalyst does
  * predicate pushdown, column pruning, and join selection (broadcast for the
  * dim tables) for free.
  *
  * 100 TB notes: dims (`region nation supplier`) are broadcast; fact⋈fact
  * (`orders⋈lineitem`) is a sort-merge/shuffled-hash join on the natural key
  * — at cluster scale both sides would be bucketed by orderkey to make it
  * shuffle-free; AQE handles skew/coalescing at runtime. All money math is
  * DECIMAL so partial aggregation is exact and order-independent.
  */
object StarQueries {

  private val M = DecimalType(18, 3) // money/quantity: exact, order-independent sums
  private def dec(c: org.apache.spark.sql.Column) = c.cast(M)
  private val one = lit(BigDecimal(1)).cast(M)

  val defs: Map[String, QueryDef] = Map(

    // ---- TPC-H Q1-shaped pricing summary: scan → filter → hash agg ----
    "q1_pricing_summary" -> QueryDef(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,3)) * (1 - CAST(l_discount AS DECIMAL(18,3)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,3)) * (1 - CAST(l_discount AS DECIMAL(18,3))) * (1 + CAST(l_tax AS DECIMAL(18,3)))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,3))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, d) =>
      Tables.lineitem(spark, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"),
          round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("sum_base_price"),
          round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))), 2)
            .cast("double").as("sum_disc_price"),
          round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) *
            (one + dec(col("l_tax")))), 2).cast("double").as("sum_charge"),
          (round(sum(dec(col("l_quantity"))), 2).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- distribution quantiles: exact + sketch (the A1-counts pattern
    //      applied to percentiles). At 100 TB exact percentile holds a
    //      whole group's values in memory — approx_percentile (bounded
    //      KLL-style summary, mergeable map-side) is the scale path. The
    //      exact columns hash-gate against quantile_cont; the approx
    //      values are gated as booleans: the sketch's rank error is
    //      <= n/ACCURACY, so the value must land between the exact
    //      quantiles at q +/- QDELTA (3x the guarantee — deterministic
    //      for fixed data, robust to merge order). Bound derived from
    //      ACCURACY so the gate and the sketch precision move together.
    "q_approx_quantiles" -> QueryDef(
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
        |  TRUE AS p50_in_bound, TRUE AS p95_in_bound
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, d) =>
      val acc = 10000 // sketch accuracy: rank error <= n/acc
      val dq = 3.0 / acc // gate half-width in quantile units (3x guarantee)
      Tables.lineitem(spark, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr(s"percentile(l_extendedprice, array(${0.5 - dq}D, 0.5D, ${0.5 + dq}D, " +
            s"${0.95 - dq}D, 0.95D, ${0.95 + dq}D))").as("ex"),
          expr(s"approx_percentile(l_extendedprice, array(0.5D, 0.95D), $acc)")
            .as("ap"))
        .select(col("l_returnflag"),
          round(col("ex")(1), 4).as("p50_exact"),
          round(col("ex")(4), 4).as("p95_exact"),
          (col("ap")(0) >= col("ex")(0) && col("ap")(0) <= col("ex")(2))
            .as("p50_in_bound"),
          (col("ap")(1) >= col("ex")(3) && col("ap")(1) <= col("ex")(5))
            .as("p95_in_bound"))
        .orderBy("l_returnflag")
    },

    // ---- column profiling: the data-quality step a pipeline runs
    //      before trusting a new drop — per column: row/null counts,
    //      exact distinct, range, checksum. Shape: unpivot (stack) to
    //      (col_name, val) then ONE aggregate — generic over N columns
    //      without an N-way distinct Expand; the scan stays narrow
    //      (only profiled columns read). At 100 TB the exact distinct
    //      is the expensive term — approx_count_distinct is the dial
    //      (same trade as q_approx_counts).
    "q_profile_stats" -> QueryDef(
      """WITH u AS (
        |  SELECT 'l_quantity' AS col_name, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |)
        |SELECT col_name, COUNT(*) AS n_rows,
        |  COUNT(*) - COUNT(val) AS n_nulls,
        |  COUNT(DISTINCT val) AS n_distinct,
        |  MIN(val) AS min_val, MAX(val) AS max_val,
        |  CAST(round(SUM(CAST(val AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_val
        |FROM u GROUP BY col_name
        |ORDER BY col_name""".stripMargin) { (spark, d) =>
      Tables.lineitem(spark, d)
        .select(expr("stack(3, 'l_quantity', l_quantity, " +
          "'l_extendedprice', l_extendedprice, " +
          "'l_discount', l_discount) AS (col_name, val)"))
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("val"))).as("n_nulls"),
          countDistinct(col("val")).as("n_distinct"),
          min(col("val")).as("min_val"), max(col("val")).as("max_val"),
          round(sum(dec(col("val"))), 2).cast("double").as("sum_val"))
        .orderBy("col_name")
    },

    // ---- feature scaling: min-max normalize a measure per group — the
    //      feature-prep step before training. Min-max (not z-score) is
    //      chosen deliberately for the oracle: MIN/MAX are exact and a
    //      single IEEE double division is bit-identical across engines,
    //      whereas stddev's accumulation order is engine-internal. Scale
    //      shape: per-group extrema via ONE hash aggregate (3 rows)
    //      broadcast-joined back — never a min/max window over whole
    //      partitions. Output sliced to a deterministic key subset so
    //      the verify parquet stays small; extrema use ALL rows.
    "q_feature_scale" -> QueryDef(
      """WITH mm AS (
        |  SELECT l_returnflag, MIN(l_extendedprice) AS mn,
        |         MAX(l_extendedprice) AS mx
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  CASE WHEN mm.mx > mm.mn
        |       THEN round((l.l_extendedprice - mm.mn) / (mm.mx - mm.mn), 6)
        |       ELSE 0.5 END AS scaled
        |FROM lineitem l JOIN mm ON mm.l_returnflag = l.l_returnflag
        |WHERE l.l_orderkey % 20 = 0
        |ORDER BY l_orderkey, l_linenumber, scaled""".stripMargin) { (spark, d) =>
      val li = Tables.lineitem(spark, d)
      val mm = li.groupBy(col("l_returnflag"))
        .agg(min(col("l_extendedprice")).as("mn"),
          max(col("l_extendedprice")).as("mx"))
      li.filter(col("l_orderkey") % 20 === 0)
        .join(broadcast(mm), "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          when(col("mx") > col("mn"),
            round((col("l_extendedprice") - col("mn")) / (col("mx") - col("mn")), 6))
            .otherwise(lit(0.5)).as("scaled"))
        .orderBy("l_orderkey", "l_linenumber", "scaled")
    },

    // ---- ranking-function window surface: dense_rank / percent_rank /
    //      cume_dist / ntile in one pass over a totally-ordered window
    //      (unique o_orderkey tiebreak makes every function
    //      deterministic; percent_rank and cume_dist are single IEEE
    //      divisions of exact integers — bit-identical cross-engine).
    //      Ranks are computed over ALL rows, the output sliced to a
    //      deterministic key subset to keep the verify parquet small.
    "q_window_ranks" -> QueryDef(
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    dense_rank() OVER w AS drank,
        |    round(percent_rank() OVER w, 6) AS prank,
        |    round(cume_dist() OVER w, 6) AS cdist,
        |    ntile(10) OVER w AS decile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice, o_orderkey))
        |WHERE o_orderkey % 20 = 0
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin) { (spark, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(spark, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          dense_rank().over(w).as("drank"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(10).over(w).as("decile"))
        .filter(col("o_orderkey") % 20 === 0)
        .orderBy("o_orderpriority", "o_orderkey")
    },

    // ---- explicit GROUPING SETS (the general form rollup/cube sugar):
    //      mixed granularities in ONE aggregate pass (Spark's Expand
    //      emits one copy per set — 3 here — into a single shuffle,
    //      instead of a union of 3 separate aggregations). grouping()
    //      flags disambiguate real NULL keys from subtotal rows; keys
    //      coalesce to a sentinel so both engines order identically.
    "q_grouping_sets" -> QueryDef(
      """SELECT COALESCE(l_returnflag, '(all)') AS rflag,
        |  COALESCE(l_linestatus, '(all)') AS lstatus,
        |  GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
        |  COUNT(*) AS n,
        |  CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, rflag, lstatus""".stripMargin) { (spark, d) =>
      Tables.lineitem(spark, d).createOrReplaceTempView("lineitem_gs")
      spark.sql(
        """SELECT COALESCE(l_returnflag, '(all)') AS rflag,
          |  COALESCE(l_linestatus, '(all)') AS lstatus,
          |  GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
          |  COUNT(*) AS n,
          |  CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_qty
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY gid, rflag, lstatus""".stripMargin)
    },

    // ---- global sort + limit (TakeOrderedAndProject, no full sort) ----
    "q2_top_orders" -> QueryDef(
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25""".stripMargin) { (spark, d) =>
      Tables.orders(spark, d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    },

    // ---- TPC-H Q3-shaped: selective dim filter → 3-way join → agg → top-k ----
    "q3_shipping_priority" -> QueryDef(
      """SELECT l_orderkey,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,3)) * (1 - CAST(l_discount AS DECIMAL(18,3)))), 2) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin) { (spark, d) =>
      val c = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(spark, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(spark, d)
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
      // customer is the small filtered side → broadcast it into orders;
      // orders⋈lineitem stays a shuffled join on the fact key.
      o.join(broadcast(c), col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))), 2)
          .cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- TPC-H Q5-shaped: 6-way join, dims broadcast ----
    "q5_region_revenue" -> QueryDef(
      """SELECT n_name,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,3)) * (1 - CAST(l_discount AS DECIMAL(18,3)))), 2) AS DOUBLE) AS revenue
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |            JOIN customer ON c_nationkey = n_nationkey
        |            JOIN orders ON o_custkey = c_custkey
        |            JOIN lineitem ON l_orderkey = o_orderkey
        |            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (spark, d) =>
      val r = Tables.region(spark, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(spark, d)
      val c = Tables.customer(spark, d)
      val o = Tables.orders(spark, d)
      val l = Tables.lineitem(spark, d)
      val s = Tables.supplier(spark, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- grouping sets: ROLLUP over two keys ----
    "q_rollup" -> QueryDef(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       COUNT(*) AS n,
        |       CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (spark, d) =>
      Tables.lineitem(spark, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus"))
    },

    // ---- CUBE grouping sets over two independent dimensions ----
    "q_cube" -> QueryDef(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(CAST(CAST(year(l_shipdate) AS INT) AS VARCHAR), 'ALL') AS yr,
        |       COUNT(*) AS n,
        |       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, CAST(year(l_shipdate) AS INT))
        |ORDER BY returnflag, yr""".stripMargin) { (spark, d) =>
      Tables.lineitem(spark, d)
        .cube(col("l_returnflag"), year(col("l_shipdate")).cast("int").as("y"))
        .agg(count(lit(1)).as("n"),
          round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("sum_price"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("y").cast("string"), lit("ALL")).as("yr"),
          col("n"), col("sum_price"))
        .orderBy("returnflag", "yr")
    },

    // ---- window frames: 7-day trailing average over the daily series ----
    "q_rolling_avg" -> QueryDef(
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
        |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,3))), 2) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1
        |)
        |SELECT day, total,
        |  round(CAST(SUM(CAST(total AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |        / (COUNT(*) OVER w), 4) AS avg7,
        |  COUNT(*) OVER w AS n7
        |FROM daily
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin) { (spark, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType => DT}
      val daily = Tables.orders(spark, d)
        .groupBy(to_date(date_trunc("day", col("o_orderdate"))).as("day"))
        .agg(round(sum(dec(col("o_totalprice"))), 2).cast("double").as("total"))
      val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
      // the trailing sum runs in DECIMAL (exact, association-free) and is
      // divided as DOUBLE at the end — windowed FP aggregation order is
      // engine-internal (segment trees vs recompute) and must not leak
      daily
        .select(col("day"), col("total"),
          round(sum(col("total").cast(DT(18, 2))).over(w).cast("double")
            / count(lit(1)).over(w), 4).as("avg7"),
          count(lit(1)).over(w).as("n7"))
        .orderBy("day")
    },

    // ---- skew-salted join (Salting.saltedJoin): the salted plan must
    //      aggregate to EXACTLY the plain-join result — the oracle runs
    //      the unsalted SQL, so any row duplication/loss from the salt
    //      explode/join breaks the hash ----
    "q_salted_agg" -> QueryDef(
      """SELECT s_nationkey AS nation, COUNT(*) AS n_items,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,3)) * (1 - CAST(l_discount AS DECIMAL(18,3)))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey
        |ORDER BY nation""".stripMargin) { (spark, d) =>
      val big = Tables.lineitem(spark, d)
        .select(col("l_suppkey").as("suppkey"),
          col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).as("rev"))
      val dim = Tables.supplier(spark, d)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      Salting.saltedJoin(big, dim, "suppkey",
        Seq(col("l_orderkey"), col("l_linenumber")), salts = 8)
        .groupBy(col("s_nationkey").as("nation"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("rev")), 2).cast("double").as("revenue"))
        .orderBy("nation")
    },

    // ---- set operations: semi/anti join + intersect as counts ----
    "q_set_ops" -> QueryDef(
      """SELECT 'parts_ordered' AS tag,
        |       (SELECT COUNT(*) FROM (SELECT p_partkey FROM part
        |         INTERSECT SELECT l_partkey FROM lineitem)) AS n
        |UNION ALL
        |SELECT 'parts_never_ordered',
        |       (SELECT COUNT(*) FROM (SELECT p_partkey FROM part
        |         EXCEPT SELECT l_partkey FROM lineitem))
        |UNION ALL
        |SELECT 'cust_and_supp_nations',
        |       (SELECT COUNT(*) FROM (SELECT c_nationkey FROM customer
        |         INTERSECT SELECT s_nationkey FROM supplier))
        |ORDER BY tag""".stripMargin) { (spark, d) =>
      // one LAZY plan: three one-row aggregates unioned — no driver
      // .count() actions at build time, so bench times the real work and
      // the plan stays reusable/cacheable like every other builder
      val p = Tables.part(spark, d).select(col("p_partkey").as("k"))
      val l = Tables.lineitem(spark, d).select(col("l_partkey").as("k"))
      def counted(tag: String, df: org.apache.spark.sql.DataFrame) =
        df.distinct.agg(count(lit(1)).as("n")).select(lit(tag).as("tag"), col("n"))
      counted("parts_ordered", p.join(l, Seq("k"), "left_semi"))
        .unionAll(counted("parts_never_ordered", p.join(l, Seq("k"), "left_anti")))
        .unionAll(counted("cust_and_supp_nations",
          Tables.customer(spark, d).select(col("c_nationkey").as("k"))
            .intersect(Tables.supplier(spark, d).select(col("s_nationkey").as("k")))))
        .orderBy("tag")
    },

    // ---- scalar string/math functions over part ----
    "q_scalar_funcs" -> QueryDef(
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substr(p_name, 1, 4) AS name4,
        |  length(p_name) AS name_len,
        |  p_brand || '/' || p_type AS brand_type,
        |  abs(p_retailprice - 1000.0) AS price_dist,
        |  round(sqrt(CAST(p_size AS DOUBLE)), 6) AS size_sqrt,
        |  p_size % 7 AS size_mod,
        |  CAST(p_size AS DOUBLE) / 2.0 AS size_half
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (spark, d) =>
      Tables.part(spark, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 4).as("name4"),
        length(col("p_name")).as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        abs(col("p_retailprice") - lit(1000.0)).as("price_dist"),
        round(sqrt(col("p_size").cast("double")), 6).as("size_sqrt"),
        (col("p_size") % 7).as("size_mod"),
        (col("p_size").cast("double") / 2.0).as("size_half"))
        .orderBy("p_partkey")
    },

    // ---- date functions: truncate/extract + monthly aggregate ----
    "q_date_agg" -> QueryDef(
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       COUNT(*) AS n_orders,
        |       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,3))), 2) AS DOUBLE) AS total,
        |       COUNT(DISTINCT o_custkey) AS n_cust
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (spark, d) =>
      Tables.orders(spark, d)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(dec(col("o_totalprice"))), 2).cast("double").as("total"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("yr", "mo")
    })
}
