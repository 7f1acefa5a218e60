package graft.functions

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** The bounded distinct-min-K aggregate's claim (VERDICT r14 #1) is STATE
  * and shuffle, not semantics: it must return exactly the collect_set →
  * array_sort → slice → transform chain's answer while holding O(K)
  * per-group buffers — so a zipf hub's partial rows shuffle K entries, not
  * its whole distinct set. Both halves are asserted here on a synthetic
  * hub graph whose one hot key carries orders of magnitude more distinct
  * members than K.
  */
class BoundedMinKSetSpec extends SparkSpec {

  private val K = 8

  /** Deterministic synthetic rows: one hub key (0) with 20k distinct
    * members (each duplicated), plus 50 light keys with ~6 members.
    */
  private def rows = {
    val hub = (0 until 20000).flatMap { i =>
      val s = (i * 2654435761L) % 1000000007L
      Seq((0L, graft.Hashing.h60Jvm(
        java.security.MessageDigest.getInstance("MD5"), s"0:$s"), s),
        (0L, graft.Hashing.h60Jvm(
          java.security.MessageDigest.getInstance("MD5"), s"0:$s"), s))
    }
    val light = (1 to 50).flatMap { c =>
      (0 until 6).map { i =>
        val s = (c * 7919L + i * 104729L) % 999983L
        (c.toLong, graft.Hashing.h60Jvm(
          java.security.MessageDigest.getInstance("MD5"), s"$c:$s"), s)
      }
    }
    hub ++ light
  }

  private def inputDf = {
    import spark.implicits._
    rows.toDF("c", "h", "s")
  }

  test("bounded aggregate equals collect_set + sort + slice + transform") {
    val minK = udaf(new BoundedMinKSet(K))
    val bounded = inputDf.groupBy("c").agg(minK(col("h"), col("s")).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val reference = inputDf.groupBy("c")
      .agg(collect_set(struct(col("h"), col("s"))).as("hs"))
      .withColumn("ss", expr(
        s"array_sort(transform(slice(array_sort(hs), 1, $K), x -> x.s))"))
      .select("c", "ss")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(bounded == reference)
    // the hub really was capped (the bound did something) and light keys
    // kept their full distinct sets (the cap is not a truncation of all)
    assert(bounded(0L).size == K)
    assert(bounded(1L).size == 6)
  }

  /** Total shuffle-write bytes across all tasks while `body` runs —
    * the DigestShuffleSpec measurement (listener events are async; poll
    * until stable).
    */
  private def shuffleWriteBytes(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) acc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var prev = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) {
        Thread.sleep(100)
        val cur = acc.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        waited += 1
      }
      acc.get
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("partial state is K-bounded: the hub shuffles a fraction of collect_set's bytes") {
    val src = inputDf.repartition(4).persist()
    src.count() // materialize OUTSIDE both measured windows
    val minK = udaf(new BoundedMinKSet(K))
    val boundedBytes = shuffleWriteBytes {
      src.groupBy("c").agg(minK(col("h"), col("s")).as("ss")).collect()
    }
    val collectSetBytes = shuffleWriteBytes {
      src.groupBy("c")
        .agg(collect_set(struct(col("h"), col("s"))).as("hs"))
        .withColumn("ss", expr(
          s"array_sort(transform(slice(array_sort(hs), 1, $K), x -> x.s))"))
        .select("c", "ss").collect()
    }
    src.unpersist()
    assert(boundedBytes > 0 && collectSetBytes > 0)
    // the hub's 20k distinct (h, s) pairs appear in every mapper's partial
    // collect_set (4 mappers × up to 20k entries × 16 bytes) vs ≤ K entries
    // per mapper for the bounded aggregate; require a 10× byte reduction
    // (the true entry ratio is ~600×, serialization overheads eat part)
    assert(boundedBytes * 10 <= collectSetBytes,
      s"bounded=$boundedBytes bytes vs collect_set=$collectSetBytes bytes — " +
        "the bounded aggregate must shuffle a small fraction")
  }

  test("merge re-caps across partials and reduce rejects duplicates in O(1)") {
    val agg = new BoundedMinKSet(3)
    val a = HsPair(1, 10); val b = HsPair(2, 20); val c = HsPair(3, 30)
    val d = HsPair(4, 40); val e = HsPair(0, 5)
    // reduce: duplicate of a full buffer's worst member is rejected
    val buf = Seq(a, b, c)
    assert(agg.reduce(buf, c) == buf)
    assert(agg.reduce(buf, d) == buf) // worse than the kth: rejected
    assert(agg.reduce(buf, e) == Seq(e, a, b)) // better: enters, c falls out
    // merge: distinct union, re-capped to the 3 smallest
    assert(agg.merge(Seq(a, c, d), Seq(e, a, b)) == Seq(e, a, b))
    // finish: member s values sorted ascending
    assert(agg.finish(Seq(e, b, a)) == Seq(5L, 10L, 20L))
  }
}
