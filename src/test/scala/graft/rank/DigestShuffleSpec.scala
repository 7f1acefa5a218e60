package graft.rank

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The digest formulation's actual claim is NETWORK cost, not local wall
  * time (SCALING.md: it loses locally at every testable size). This spec
  * asserts the claim directly: over the same materialized candidate set,
  * the per-partition TopBuf digest shuffles a bounded number of bytes
  * (≤ kMax rows per group per mapper) while the window formulation
  * shuffles every candidate row to sort it.
  */
class DigestShuffleSpec extends SparkSpec {

  /** Total shuffle-write bytes across all tasks while `body` runs.
    * Listener events are asynchronous — poll until the counter is
    * stable so late task-end events are counted.
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

  test("digest shuffles a K-bounded fraction of the window formulation's bytes") {
    // ~160 candidates per (user, domain); the digest caps each mapper's
    // contribution at kMax=10 rows per group
    val scored = Metrics.scoredCandidates(spark, sf()).persist()
    scored.count() // materialize OUTSIDE both measured windows
    val w = Window.partitionBy("user_id", "domain")
      .orderBy(col("score").desc, col("item_id"))
    val windowBytes = shuffleWriteBytes {
      scored.withColumn("rn", row_number().over(w))
        .filter(col("is_positive") === 1)
        .select("user_id", "domain", "rn").collect()
    }
    val digestBytes = shuffleWriteBytes {
      Metrics.posRanksDigestFrom(scored, 10).collect()
    }
    scored.unpersist()
    assert(windowBytes > 0 && digestBytes > 0)
    // 160-row groups digested to ≤10 rows: require at least a 3× byte
    // reduction (the raw row ratio is ~16×; serialization overheads and
    // per-group constants eat part of it)
    assert(digestBytes * 3 <= windowBytes,
      s"digest=$digestBytes bytes vs window=$windowBytes bytes — " +
        "the digest must shuffle a small fraction of the window's bytes")
  }

  test("digest ranks agree with the window formulation on the same input") {
    val scored = Metrics.scoredCandidates(spark, sf()).persist()
    val w = Window.partitionBy("user_id", "domain")
      .orderBy(col("score").desc, col("item_id"))
    val win = scored.withColumn("rn", row_number().over(w))
      .filter(col("is_positive") === 1)
      .select("user_id", "domain", "rn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val dig = Metrics.posRanksDigestFrom(scored, 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      // digest reports rank 0 when the positive fell below kMax — drop
      // those and the window rows they correspond to
      .filter(_._3 > 0).toSet
    scored.unpersist()
    assert(dig == win.filter(_._3 <= 10))
    assert(dig.nonEmpty)
  }
}
