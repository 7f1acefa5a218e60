package graft

import java.nio.file.Files

/** E1 lifecycle composition: epochs accumulate in the log, the split
  * cache is written once, and best-epoch selection is keep-first.
  */
class LifecycleSpec extends SparkSpec {

  test("three epochs -> memoized splits, accumulated log, argmax selection") {
    val workDir = Files.createTempDirectory("lc").toString
    val m1 = Lifecycle.runEpoch(spark, sf(), workDir, 1).collect()
    assert(m1.nonEmpty)
    val cacheStamp = Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$workDir/cache/splits/_SUCCESS"))
    Lifecycle.runEpoch(spark, sf(), workDir, 2)
    Lifecycle.runEpoch(spark, sf(), workDir, 3)
    // split cache not recomputed by later epochs
    assert(Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$workDir/cache/splits/_SUCCESS")) == cacheStamp)

    val log = etl.MetricsSink.readParquet(spark, s"$workDir/metrics_log")
    assert(log.select("epoch").distinct().count() == 3)

    val best = Lifecycle.bestEpochs(spark, workDir).collect()
    // one winner per (domain, k, metric)
    assert(best.length == 2 * 2 * 3)
    // the winner's value must equal the max over the log for that slice
    val logRows = log.collect()
    best.foreach { b =>
      val slice = logRows.filter(r =>
        r.getAs[String]("domain") == b.getAs[String]("domain") &&
          r.getAs[Int]("k") == b.getAs[Int]("k"))
      val col = b.getAs[String]("metric")
      assert(b.getAs[Double]("value") == slice.map(_.getAs[Double](col)).max)
    }
  }
}
