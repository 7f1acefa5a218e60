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

    // the fused multi-epoch digest (the [[runEpochs]] loop — every
    // epoch's TopBuf built in one scan) must reproduce the single-epoch
    // digest ranks EXACTLY, per epoch — this is what keeps the
    // q_lifecycle oracle hash invariant across the two forms
    val (sp, ng, _) = etl.SplitCache.cachedPipeline(spark, sf(), s"$workDir/cache")
    val cands = Lifecycle.candidatesFrom(sp, ng)
    val epochs = Seq(1, 2, 3)
    val multi = rank.Metrics.posRanksDigestMultiFrom(
      Lifecycle.epochScores(cands, epochs), kMax = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)) -> r.getInt(3))
      .toMap
    assert(multi.nonEmpty)
    epochs.zipWithIndex.foreach { case (e, i) =>
      val single = Lifecycle.epochRanks(cands, e)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
      assert(single.keySet.map { case (u, d) => (u, d, i) } ==
        multi.keySet.filter(_._3 == i))
      single.foreach { case ((u, d), rn) =>
        assert(multi((u, d, i)) == rn, s"($u,$d) e$e: multi vs single")
      }
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
