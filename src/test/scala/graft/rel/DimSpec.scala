package graft.rel

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** DimQueries behavior + the scale properties its Scaladoc claims:
  * SCD2's single shuffle, the regression's moment-only aggregation, and
  * Z-order's two-dimensional clustering bound (the data-skipping proof).
  */
class DimSpec extends SparkSpec {

  private def plan(name: String): String = {
    spark.catalog.clearCache()
    SparkEntry.defs(name).build(spark, sf())
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q_scd2: intervals chain per user and exactly one row-shuffle") {
    val rows = SparkEntry.defs("q_scd2").build(spark, sf()).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { vs =>
      val sorted = vs.sortBy(_.getLong(4))
      // each version's valid_to is the next version's valid_from; the
      // last is open-ended and flagged current
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(3) == b.getTimestamp(2), "intervals must chain")
          assert(a.getInt(5) == 0)
        case _ =>
      }
      assert(sorted.last.getInt(5) == 1, "last version must be current")
      assert(sorted.last.isNullAt(3), "open interval carries NULL valid_to")
      // consecutive versions always change type (collapse worked)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(1) != b.getString(1))
        case _ =>
      }
    }
    // one Exchange for the user_id partitioning; the final presentation
    // sort may add a range exchange but no third row-shuffle exists
    val shuffles = """\(\d+\) Exchange""".r.findAllIn(plan("q_scd2")).size
    assert(shuffles <= 2, s"expected hash + presentation-sort exchanges only, got $shuffles")
  }

  test("q_group_regr: moments-only shuffle and slope matches a direct fit") {
    val r = SparkEntry.defs("q_group_regr").build(spark, sf()).collect()
    assert(r.length == 3)
    // cross-check one group against an independently computed OLS fit
    val rows = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_returnflag") === r.head.getString(0))
      .select("l_quantity", "l_extendedprice").collect()
    val xs = rows.map(_.getDouble(0)); val ys = rows.map(_.getDouble(1))
    val n = xs.length.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.head.getDouble(2) - slope) < 1e-3,
      s"engine slope ${r.head.getDouble(2)} vs direct $slope")
    assert(r.forall(row => row.getDouble(4) >= 0 && row.getDouble(4) <= 1), "r2 in [0,1]")
  }

  test("q_outliers: fences match a driver-side exact computation") {
    val r = SparkEntry.defs("q_outliers").build(spark, sf()).collect()
    assert(r.length == 3)
    r.foreach { row =>
      val (n, q1, q3, nOut) =
        (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      assert(q1 <= q3 && n > 0 && nOut >= 0 && nOut < n)
      assert(row.getDouble(5) == math.rint(nOut.toDouble / n * 1e6) / 1e6 ||
        math.abs(row.getDouble(5) - nOut.toDouble / n) < 1e-6)
    }
    val flag = r.head.getString(0)
    val cents = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_returnflag") === flag)
      .select((col("l_extendedprice").cast("decimal(18,3)") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    val q1 = cents((n + 3) / 4 - 1); val q3 = cents((3 * n + 3) / 4 - 1)
    assert(r.head.getLong(2) == q1 && r.head.getLong(3) == q3)
    val out = cents.count(c => 4 * c > 4 * q3 + 6 * (q3 - q1) || 4 * c < 4 * q1 - 6 * (q3 - q1))
    assert(r.head.getLong(4) == out)
  }

  test("q_pivot: quarterly cells re-add to the flag totals") {
    val r = SparkEntry.defs("q_pivot").build(spark, sf()).collect()
    assert(r.length == 3)
    val totals = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice").cast("decimal(18,3)")).as("t"))
      .collect().map(row => row.getString(0) ->
        row.getDecimal(1).doubleValue()).toMap
    r.foreach { row =>
      val cells = (1 to 4).map(i => if (row.isNullAt(i)) 0.0 else row.getDouble(i))
      assert(math.abs(cells.sum - totals(row.getString(0))) < 0.05,
        s"${row.getString(0)}: ${cells.sum} vs ${totals(row.getString(0))}")
    }
  }

  test("q_zorder: every bucket bounds BOTH key dimensions (skipping proof)") {
    val r = SparkEntry.defs("q_zorder").build(spark, sf()).collect()
    assert(r.nonEmpty)
    // top-6 interleaved bits = top-3 bits of each 10-bit key: every
    // bucket confines partkey AND suppkey to a 128-wide slab, so a scan
    // keyed on EITHER dimension skips ~7/8 of buckets. A 1-D partkey
    // sort leaves suppkey spanning its whole domain.
    r.foreach { row =>
      assert(row.getLong(3) - row.getLong(2) <= 127,
        s"partkey span too wide in bucket ${row.getLong(0)}")
      assert(row.getLong(5) - row.getLong(4) <= 127,
        s"suppkey span too wide in bucket ${row.getLong(0)}")
    }
  }

  test("q_winsorized clamps exactly at the P5/P95 order statistics") {
    val raw = spark.read.parquet(sf() + "/lineitem.parquet")
      .selectExpr("l_returnflag",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,3)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rows = graft.SparkEntry.defs("q_winsorized").build(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      val cents = raw.filter(_._1 == flag).map(_._2).sorted
      val n = cents.length
      assert(r.getAs[Long]("n") == n)
      val p5 = cents((n + 19) / 20 - 1)
      val p95 = cents((19 * n + 19) / 20 - 1)
      assert(r.getAs[Long]("p5_cents") == p5 && r.getAs[Long]("p95_cents") == p95)
      val meanW = cents.map(c => math.min(math.max(c, p5), p95))
        .map(BigInt(_)).sum.toDouble / n / 100.0
      assert(math.abs(r.getAs[Double]("mean_winsor") - meanW) < 1e-5)
      // clamped mean lies inside the fences
      assert(r.getAs[Double]("mean_winsor") * 100 >= p5
        && r.getAs[Double]("mean_winsor") * 100 <= p95)
    }
  }
}
