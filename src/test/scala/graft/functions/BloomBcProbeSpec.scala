package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The broadcast-shipped codegen Bloom probe: correctness (no false
  * negatives; confirmable semantics) and the r11 leak fix — cachedColumn
  * builds/broadcasts at most once per (SparkContext, key), so a
  * long-lived session rebuilding the same query holds ONE multi-MB
  * broadcast, not one per rebuild.
  */
class BloomBcProbeSpec extends SparkSpec {
  import spark.implicits._

  test("probe has no false negatives and prunes most non-members") {
    val members = (0L until 1000L).map(_ * 7L)
    val filter = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    members.foreach(filter.putLong)
    val df = spark.range(7000).select(col("id").as("v"))
    val hits = df.filter(BloomBcProbe.column(spark, filter, col("v")))
      .as[Long].collect().toSet
    assert(members.forall(hits), "Bloom filters never false-negative")
    // fpp 0.01 over 6000 non-members: generous 5x headroom on the bound
    assert(hits.size <= members.size + 300,
      s"probe should prune non-members, kept ${hits.size}")
  }

  test("cachedColumn broadcasts once per key; new keys get new entries") {
    def build = {
      val f = org.apache.spark.util.sketch.BloomFilter.create(100, 0.03)
      f.putLong(42L); f
    }
    val k = s"spec:${java.util.UUID.randomUUID()}"
    val before = BloomBcProbe.registeredCount
    BloomBcProbe.cachedColumn(spark, k, col("id"))(build)
    val afterFirst = BloomBcProbe.registeredCount
    assert(afterFirst == before + 1)
    // same key: reuse, no new broadcast handle
    val c2 = BloomBcProbe.cachedColumn(spark, k, col("id"))(build)
    assert(BloomBcProbe.registeredCount == afterFirst,
      "rebuilding the same query must not leak a new broadcast")
    // the reused handle still evaluates
    assert(spark.range(100).filter(c2).count() == 1)
    // a different key is a different filter → new entry
    BloomBcProbe.cachedColumn(spark, k + "/other", col("id"))(build)
    assert(BloomBcProbe.registeredCount == afterFirst + 1)
  }
}
