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

    // S3 persist + reload: six checkpoints (domain × metric at K=10),
    // each reproducing its selected epoch's scores from RELOADED weights
    val ckpts = Lifecycle.checkpointBest(spark, workDir)
    assert(ckpts.size == 2 * 3)
    val someUsers = spark.range(1, 20).toDF("user_id")
    ckpts.foreach { case ((_, _), (epoch, path)) =>
      val fromCkpt = Lifecycle.scoreFromCheckpoint(spark, path, someUsers)
        .collect().map(_.toSeq)
      val w = Lifecycle.epochWeights(epoch)
      val direct = score.Scorer.scoreUsersWith(spark, someUsers, w("W"), w("E"))
        .collect().map(_.toSeq)
      assert(fromCkpt.nonEmpty && fromCkpt.sortBy(_.toString)
        .sameElements(direct.sortBy(_.toString)))
    }
  }
}
