package graft.rel

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Boundary semantics of the r9 sweep-line formulations
  * (q_events_range_join, q_attribution): the oracle gate proves
  * sweep ≡ join on the sf0.01 distribution, but microsecond ties at the
  * exact window bounds are too rare there to be exercised — these
  * fixtures pin every inclusive/exclusive edge and the deterministic
  * last-touch tiebreak on hand-built events written through the real
  * parquet loader path.
  */
class SweepSpec extends SparkSpec {
  import spark.implicits._

  private val win = 24L * 3600 * 1000000

  /** Write a synthetic events table (driver schema) and return its dir. */
  private def fixture(name: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    val dir = s"/tmp/graft-sweep-fixture-$name"
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("range-join sweep: window bounds are [t, t+24h) exactly, ties included") {
    val T = 100L * win
    val U = 300L * win
    val d = fixture("range", Seq(
      // user 1: clicks straddling every bound of error 500's window
      (1L, T - 1, 1L, "click", 0.0, "{\"k\": 1}"),       // out: < t
      (2L, T, 1L, "click", 0.0, "{\"k\": 1}"),           // in: == t (tie)
      (3L, T + win - 1, 1L, "click", 0.0, "{\"k\": 1}"), // in: last µs
      (4L, T + win, 1L, "click", 0.0, "{\"k\": 1}"),     // out: == t+24h
      (500L, T, 1L, "error", 0.0, null),
      // error with no in-window clicks (clicks exist, all outside)
      (501L, T + 5 * win, 1L, "error", 0.0, null),
      // user 3: error with no clicks at all on the user
      (502L, T, 3L, "error", 0.0, null),
      // user 4: single click at the very last in-window microsecond
      (5L, U + win - 1, 4L, "click", 0.0, "{\"k\": 2}"),
      (6L, U - 5, 4L, "click", 0.0, "{\"k\": 2}"),       // out: before t
      (503L, U, 4L, "error", 0.0, null)))
    val got = SparkEntry.defs("q_events_range_join").build(spark, d)
      .collect().map(r => (r.getLong(0),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq(
      (500L, 2L, 0L),        // clicks at t and t+24h−1; gap 0 from the tie
      (501L, 0L, -1L),       // no in-window click → 0 / NULL
      (502L, 0L, -1L),       // clickless user → 0 / NULL
      (503L, 1L, win - 1)),  // the last-µs click alone
      s"boundary semantics broke: $got")
  }

  test("attribution sweep: trailing bounds [t−24h, t), last-touch tiebreak by min click_id") {
    val T = 100L * win
    val S = T + 10 * win
    val d = fixture("attr", Seq(
      // user 1 clicks around purchase 900 at T (window [T−24h, T))
      (10L, T - win - 1, 1L, "click", 0.0, "{\"k\": 3}"), // out: < t−24h
      (11L, T - win, 1L, "click", 0.0, "{\"k\": 1}"),     // in: == t−24h
      (12L, T - 1, 1L, "click", 0.0, "{\"k\": 2}"),       // in: last µs
      (13L, T, 1L, "click", 0.0, "{\"k\": 3}"),           // out for 900 (== t), in for 901
      (900L, T, 1L, "purchase", 1.0, null),
      (901L, T + 10, 1L, "purchase", 2.0, null),
      // purchase with an empty window → the campaign −1 bucket
      (902L, T + 2 * win, 1L, "purchase", 4.0, null),
      // user 2: two clicks at the SAME µs — last-touch must pick min id
      (20L, S, 2L, "click", 0.0, "{\"k\": 0}"),
      (21L, S, 2L, "click", 0.0, "{\"k\": 1}"),
      (903L, S + 1, 2L, "purchase", 8.0, null)))
    val got = SparkEntry.defs("q_attribution").build(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    // campaign 1 carries linear credit (clicks 11, 21) but never wins a
    // last touch, so the inner join drops it — oracle-parity semantics.
    assert(got == Seq(
      (-1L, 0L, 4.0, 4.0),   // purchase 902: unattributed, value conserved
      (0L, 1L, 4.0, 8.0),    // click 20 beats 21 on min click_id at tied µs
      (2L, 2L, 1.5, 1.0),    // 900: 0.5 of v=1; 901: 1.0 of v=2; last of 900
      (3L, 1L, 1.0, 2.0)),   // 901's clicks {12, 13}; 13 (== t of 900) in
      s"attribution boundary semantics broke: $got")
  }

  test("randomized differential: sweep and chunked-window equal JVM brute force on tie-heavy data") {
    // the hand-picked fixtures above pin each boundary once; this drives
    // BOTH reformulations through 600 random events whose timestamps are
    // drawn from a lattice of exact window-boundary offsets (quarter-
    // window steps ± 1 µs), so same-µs ties and frame-edge collisions
    // occur constantly. Deterministic seed → reproducible failures.
    val rnd = new scala.util.Random(2020)
    val q = win / 4
    val types = Seq("click", "error", "view", "purchase")
    val rows = (1L to 600L).map { id =>
      val us = rnd.nextInt(20).toLong * q + (rnd.nextInt(3) - 1).toLong + win
      val user = 1L + rnd.nextInt(3)
      val tpe = types(rnd.nextInt(4))
      val v = (rnd.nextInt(5000) + 1).toDouble / 1000.0
      (id, us, user, tpe, v, s"""{"k": ${rnd.nextInt(100)}}""")
    }
    val d = fixture("rand", rows)

    // q_events_range_join vs brute force
    val clicks = rows.filter(_._4 == "click")
    val expectedRange = rows.filter(_._4 == "error").sortBy(_._1).map { e =>
      val cs = clicks.filter(c =>
        c._3 == e._3 && c._2 >= e._2 && c._2 < e._2 + win)
      (e._1, if (cs.isEmpty) 0L else cs.size.toLong,
        if (cs.isEmpty) -1L else cs.map(_._2).min - e._2)
    }
    val gotRange = SparkEntry.defs("q_events_range_join").build(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(gotRange == expectedRange, "range-join sweep diverged from brute force")

    // q_trailing_24h vs brute force (trailing frame INCLUDES t−24h: the
    // RANGE 24h-PRECEDING bound is value-inclusive in both engines)
    val expectedTrail = rows.sortBy(_._1).map { e =>
      val fr = rows.filter(x =>
        x._3 == e._3 && x._2 >= e._2 - win && x._2 <= e._2)
      val sum = fr.map(x => BigDecimal(x._5).setScale(3,
          BigDecimal.RoundingMode.HALF_UP)).sum
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      (e._1, fr.size.toLong, sum)
    }
    val gotTrail = SparkEntry.defs("q_trailing_24h").build(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(gotTrail.size == expectedTrail.size)
    gotTrail.zip(expectedTrail).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && math.abs(g._3 - e._3) < 1e-9,
        s"trailing-window chunking diverged at event ${e._1}: got $g want $e")
    }
  }
}
