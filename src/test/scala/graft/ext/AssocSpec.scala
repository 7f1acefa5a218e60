package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the association-mining operators at sf0.001. */
class AssocSpec extends SparkSpec {

  test("item cooc: lift recomputes from raw counts, pairs ordered, support holds") {
    val i = graft.etl.Interactions(spark, sf())
      .filter(col("domain") === "x").select("user_id", "item_id")
    val itemN = i.groupBy("item_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nu = i.select("user_id").distinct().count()
    val byUser = i.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val coocBrute = new scala.collection.mutable.HashMap[(Long, Long), Long]
    byUser.values.foreach { items =>
      for (a <- items.indices; b <- a + 1 until items.length)
        coocBrute((items(a), items(b))) =
          coocBrute.getOrElse((items(a), items(b)), 0L) + 1L
    }
    val rows = graft.SparkEntry.defs("q_item_cooc").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"))
      assert(a < b)
      val c = r.getAs[Long]("c_ab")
      assert(c >= 3 && c == coocBrute((a, b)))
      assert(r.getAs[Long]("n_a") == itemN(a) && r.getAs[Long]("n_b") == itemN(b))
      val lift = BigDecimal(c.toDouble * nu / (itemN(a) * itemN(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("lift") == lift)
    }
    // descending lift with (item_a, item_b) tiebreak — a total order
    val key = rows.map(r => (-r.getAs[Double]("lift"),
      r.getAs[Long]("item_a"), r.getAs[Long]("item_b")))
    assert(key.sameElements(key.sorted))
  }

  test("item knn: sim recomputes, ranks dense per item, lists symmetric-capable") {
    val i = graft.etl.Interactions(spark, sf())
      .filter(col("domain") === "x").select("user_id", "item_id")
    val itemN = i.groupBy("item_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = graft.SparkEntry.defs("q_item_knn").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("item_a")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.sameElements(1 to rs.length))
      assert(rs.length <= 5)
      // descending rounded sim with item_b tiebreak
      val key = rs.sortBy(_.getAs[Int]("rn"))
        .map(r => (-r.getAs[Double]("sim"), r.getAs[Long]("item_b")))
      assert(key.sameElements(key.sorted))
    }
    rows.foreach { r =>
      val sim = BigDecimal(r.getAs[Long]("c_ab").toDouble /
          math.sqrt(itemN(r.getAs[Long]("item_a")).toDouble *
            itemN(r.getAs[Long]("item_b"))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("sim") == sim)
    }
  }

  test("markov transitions: row-stochastic per source, counts conserve") {
    val rows = graft.SparkEntry.defs("q_markov_trans").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("src")).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("p")).sum - 1.0) < 1e-4)
    }
    // every user with n events contributes exactly n-1 transitions
    val perUser = spark.read.parquet(sf() + "/events.parquet")
      .groupBy("user_id").count().collect().map(_.getLong(1))
    assert(rows.map(_.getAs[Long]("c")).sum == perUser.map(_ - 1).sum)
  }

  test("degree cap bounds a power user's pairs and matches brute force on the kept set") {
    import spark.implicits._
    val cap = 10
    // one power user (200 items), one small user (4 items), one pair of
    // users sharing items so a pair survives MINSUP=3
    val rows =
      (1L to 200L).map(it => (1L, it)) ++
        Seq((2L, 5L), (2L, 6L), (2L, 7L), (2L, 8L)) ++
        Seq((3L, 5L), (3L, 6L), (3L, 7L), (3L, 8L)) ++
        Seq((4L, 5L), (4L, 6L), (4L, 7L), (4L, 8L))
    val pruned = rows.toDF("user_id", "item_id")
    val out = AssocQueries.cappedPairs(pruned, cap).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // expected: per user keep the `cap` items with smallest (h60, item)
    val kept = rows.groupBy(_._1).view.mapValues { rs =>
      rs.map(_._2).distinct
        .map(it => (graft.Hashing.h60Jvm(
          java.security.MessageDigest.getInstance("MD5"), s"$it:cooc"), it))
        .sorted.take(cap).map(_._2).sorted
    }.toMap
    val brute = new scala.collection.mutable.HashMap[(Long, Long), Long]
    kept.values.foreach { items =>
      for (a <- items.indices; b <- a + 1 until items.length)
        brute((items(a), items(b))) = brute.getOrElse((items(a), items(b)), 0L) + 1L
    }
    val expected = brute.filter(_._2 >= 3).toMap
    assert(out == expected, s"capped pairs must equal brute force on the kept sets")
    // the power user's kept basket is exactly `cap` items — its pair
    // contribution is bounded at C(cap,2), not C(200,2)
    assert(kept(1L).length == cap)
    // no emitted pair touches an item the power user's cap dropped AND
    // no other user holds (items > 8 exist only in user 1's basket)
    val dropped = (1L to 200L).toSet -- kept(1L).toSet -- Set(5L, 6L, 7L, 8L)
    assert(out.keys.forall { case (a, b) => !dropped(a) && !dropped(b) })
  }
}
