package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join equals the plain join and spreads the hot key. */
class SaltingSpec extends SparkSpec {

  test("salted join is row-equivalent to the plain join") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val big = (1L to 1000L).map(i => (if (i <= 900) 7L else i % 50, i))
      .toDF("k", "row_id")
    val dim = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(dim, "k").select("row_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = Salting.saltedJoin(big, dim, "k", col("row_id"), 8)
      .select("row_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.sameElements(plain))
  }

  test("hot key spreads across salt partitions") {
    import spark.implicits._
    val big = (1L to 1000L).map(i => (7L, i)).toDF("k", "row_id")
    val saltCounts = big
      .withColumn("_salt", pmod(xxhash64(col("row_id")), lit(8)))
      .groupBy("_salt").count().collect()
    assert(saltCounts.length == 8) // every salt bucket gets a share
    assert(saltCounts.map(_.getAs[Long]("count")).max < 1000)
  }
}
