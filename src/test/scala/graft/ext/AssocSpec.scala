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
}
